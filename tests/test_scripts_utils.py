"""scripts/utils.py helpers (artifact plumbing)."""

import csv
import sys


def _utils():
    sys.path.insert(0, ".")
    from scripts import utils

    return utils


def test_append_csv_new_file(tmp_path):
    u = _utils()
    p = str(tmp_path / "a.csv")
    u.append_csv(p, {"N": 1, "min_s": 0.5})
    rows = list(csv.DictReader(open(p)))
    assert rows == [{"N": "1", "min_s": "0.5"}]


def test_append_csv_same_schema_appends(tmp_path):
    u = _utils()
    p = str(tmp_path / "a.csv")
    u.append_csv(p, {"N": 1, "min_s": 0.5})
    u.append_csv(p, {"N": 2, "min_s": 0.25})
    rows = list(csv.DictReader(open(p)))
    assert [r["N"] for r in rows] == ["1", "2"]


def test_append_csv_schema_evolution_rewrites_union(tmp_path):
    """A new column (e.g. the round-5 'route' field) must upgrade the
    whole file to the union header — old rows get "", never a
    misaligned value under the old header."""
    u = _utils()
    p = str(tmp_path / "a.csv")
    u.append_csv(p, {"N": 1, "min_s": 0.5})
    u.append_csv(p, {"N": 2, "min_s": 0.25, "route": "fused"})
    rows = list(csv.DictReader(open(p)))
    assert rows[0] == {"N": "1", "min_s": "0.5", "route": ""}
    assert rows[1] == {"N": "2", "min_s": "0.25", "route": "fused"}


def test_append_csv_missing_column_fills_blank(tmp_path):
    u = _utils()
    p = str(tmp_path / "a.csv")
    u.append_csv(p, {"N": 1, "min_s": 0.5, "route": "xla"})
    u.append_csv(p, {"N": 2, "min_s": 0.25})  # fewer keys than header
    rows = list(csv.DictReader(open(p)))
    assert rows[1]["route"] == ""
