"""Reader/writer for the interleaved-documents table.

The north rule specifies a Lance table; this sandbox has no Lance runtime,
so we read/write the *identical schema* in Parquet and prefer Lance when the
``lance`` package is importable (``ray.data.read_lance`` exists in Ray
2.49). Column pruning is pushed to the read in both paths.
"""

from __future__ import annotations

import ray.data as rd


def _has_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_documents(uri: str | list[str],
                   columns: list[str] | None = None) -> rd.Dataset:
    """Read the interleaved documents table (doc_id, spans).

    ``uri`` may be a Lance dataset dir (``*.lance`` or with Lance present),
    a Parquet file/dir, or an explicit list of parquet files (the
    partition-resume path). Columns are pruned at the read so a
    metadata-only pass never ships span payloads off storage.
    """
    if isinstance(uri, str) and (
            uri.endswith(".lance")
            or (_has_lance() and uri.rstrip("/").endswith("lance"))):
        return rd.read_lance(uri, columns=columns)
    return rd.read_parquet(uri, columns=columns)


def write_documents(ds: rd.Dataset, uri: str, **kw) -> None:
    if uri.endswith(".lance") and _has_lance():
        ds.write_lance(uri, **kw)
        return
    ds.write_parquet(uri, **kw)
