"""Frozen-golden regression gate.

The pipeline==extract_doc equality tests (test_pipeline.py) prove the
DISTRIBUTED plumbing but are circular on semantics: a change to shared
parse code shifts both sides together and passes silently. This test
compares a fresh end-to-end pipeline run on the deterministic sf0.001
corpus against a COMMITTED parquet (tests/data/golden_extract_sf0001.parquet,
frozen by tools/freeze_golden.py) — any semantic drift fails here and must
be re-frozen deliberately, with the diff reviewed.
"""

import os

import pyarrow.parquet as pq
import pytest

from tools.freeze_golden import GOLDEN_PATH, build_flat_extraction


@pytest.mark.usefixtures("ray_session")
def test_extraction_matches_frozen_golden(tmp_path):
    assert os.path.exists(GOLDEN_PATH), (
        "golden missing — run `python tools/freeze_golden.py` and commit "
        "the file")
    got = build_flat_extraction(str(tmp_path / "out"))
    want = pq.read_table(GOLDEN_PATH)
    assert got.num_rows == want.num_rows, (
        f"span count drifted: {got.num_rows} vs frozen {want.num_rows}")
    for col in ("doc_id", "offset", "kind", "text", "media_ref"):
        g, w = got.column(col).to_pylist(), want.column(col).to_pylist()
        if g != w:
            bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
            raise AssertionError(
                f"column {col!r} drifted from the frozen golden at flat row "
                f"{bad}: got {g[bad]!r}, frozen {w[bad]!r} "
                f"(doc {got.column('doc_id')[bad]!r}). If the change is "
                "intended, re-freeze with tools/freeze_golden.py and commit.")
