from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from etl_sber_spark.session import get_spark

    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


def parquet_col_ranges(path_glob: str, col: str, per: str = "file"):
    """(min, max) spans of one column from real parquet footers — the
    zone maps the reader prunes by. ``per='file'`` folds row groups to
    one span per file; ``per='rowgroup'`` keeps them separate. Shared
    by the clustering tests (test_warehouse_ops, test_zorder)."""
    import glob as _glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(_glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for i in range(md.row_group(rg).num_columns):
                c = md.row_group(rg).column(i)
                if c.path_in_schema == col:
                    st = c.statistics
                    if per == "rowgroup":
                        out.append((st.min, st.max))
                    else:
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
        if per == "file" and lo is not None:
            out.append((lo, hi))
    return out
