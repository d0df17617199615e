import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session")
def ray_session():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


def ds_to_pandas(ds):
    """Dataset → DataFrame preserving schema on all-empty results:
    Ray's to_pandas returns a column-less frame when every block is
    empty even though ds.schema() is known. Shared by the query-parity
    and randomized-op tests (tools/driver_check.py carries its own copy
    to stay a standalone tool)."""
    import pandas as pd
    import pyarrow as pa
    if isinstance(ds, pd.DataFrame):
        return ds
    if isinstance(ds, pa.Table):
        return ds.to_pandas()
    df = ds.to_pandas()
    if df.shape[1] == 0:
        sch = ds.schema()
        df = pa.Table.from_arrays([pa.array([], t) for t in sch.types],
                                  names=sch.names).to_pandas()
    return df
