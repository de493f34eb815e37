"""Top-level I/O verbs (parity: ``nums/api.py:23-71``)."""

from nums_tpu.core.application_manager import instance as _instance


def _is_s3(filename: str) -> bool:
    return filename.startswith("s3://")


def read(filename: str):
    """Read a persisted BlockArray; ``s3://`` prefix dispatches to S3."""
    if _is_s3(filename):
        return _instance().read_s3(filename[len("s3://"):])
    return _instance().read_fs(filename)


def write(ba, filename: str):
    if _is_s3(filename):
        return _instance().write_s3(ba, filename[len("s3://"):])
    return _instance().write_fs(ba, filename)


def delete(filename: str):
    if _is_s3(filename):
        return _instance().delete_s3(filename[len("s3://"):])
    return _instance().delete_fs(filename)


def read_csv(filename, dtype=float, delimiter=",", has_header=False,
             num_workers=None):
    return _instance().read_csv(
        filename, dtype=dtype, delimiter=delimiter, has_header=has_header,
        num_workers=num_workers,
    )


def read_parquet(filename, columns=None, dtype=None):
    """Parquet file → BlockArray (beyond the reference's CSV/S3/npy).

    Row groups are read one at a time and assembled region-wise into
    the sharded array (the same partition-streamed path the pandas/
    modin bridge uses) — peak extra host memory is the decoded groups,
    never a second full-frame copy. Requires pyarrow.
    """
    import pyarrow.parquet as pq

    from nums_tpu.experimental.nums_modin import _from_row_parts

    pf = pq.ParquetFile(filename)
    parts = []
    for i in range(pf.num_row_groups):
        tbl = pf.read_row_group(i, columns=columns)
        arr = tbl.to_pandas().to_numpy()
        if dtype is not None:
            arr = arr.astype(dtype)
        parts.append(arr)
    assert parts, f"{filename}: no row groups"
    return _from_row_parts(parts, dtype=dtype)
