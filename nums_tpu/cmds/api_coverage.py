"""API-surface coverage report (parity: ``nums/core/cmds/api_coverage.py:26-210``,
the ``nums-coverage`` console script).

Reports, for each numpy module surface (numpy, numpy.random, numpy.linalg,
numpy.fft), how many callables the nums_tpu facade implements, how many
raise ``_not_implemented`` stubs, and the coverage percentage.
"""

import inspect

import numpy as np


IGNORE = {
    # Non-array utilities / deprecated / printing — not API-parity targets.
    "load", "save", "savez", "savetxt", "set_printoptions", "get_printoptions",
    "printoptions", "seterr", "geterr", "errstate", "deprecate",
    "disp", "info", "source", "who", "lookfor", "safe_eval",
    "getbufsize", "setbufsize", "shares_memory", "may_share_memory",
    "show_config", "show_runtime", "get_include", "add_docstring",
    "frompyfunc", "vectorize", "memmap",
}


def _module_coverage(np_module, our_module):
    implemented, fallback, missing = [], [], []
    for name in sorted(dir(np_module)):
        if name.startswith("_") or name in IGNORE:
            continue
        np_obj = getattr(np_module, name)
        if not callable(np_obj) or inspect.isclass(np_obj):
            continue
        ours = getattr(our_module, name, None)
        if ours is None:
            missing.append(name)
        elif getattr(ours, "_nums_tpu_stub", False):
            fallback.append(name)
        else:
            implemented.append(name)
    return implemented, fallback, missing


def coverage_report():
    import nums_tpu.numpy as nps

    sections = [
        ("numpy", np, nps),
        ("numpy.random", np.random, nps.random),
        ("numpy.linalg", np.linalg, nps.linalg),
        ("numpy.fft", np.fft, nps.fft),
    ]
    lines = []
    for name, np_mod, our_mod in sections:
        impl, fb, miss = _module_coverage(np_mod, our_mod)
        total = len(impl) + len(fb) + len(miss)
        pct = 100.0 * len(impl) / total if total else 0.0
        lines.append(
            f"{name}: implemented {len(impl)}/{total} ({pct:.1f}%), "
            f"stubs {len(fb)}, missing {len(miss)}"
        )
        if miss:
            lines.append(f"  missing: {', '.join(miss[:25])}"
                         + (" ..." if len(miss) > 25 else ""))
    return "\n".join(lines)


def main():
    print(coverage_report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
