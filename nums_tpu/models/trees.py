"""Tree models — placeholder (parity: the reference's empty
``nums/models/trees.py``; tree training lives in
``nums_tpu.experimental.nums_xgb``)."""
