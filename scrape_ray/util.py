"""Small driver-side helpers (safe only on SMALL results — anything
that materializes goes through here so the full-dataset paths stay
streaming)."""

from __future__ import annotations

import pyarrow as pa


def dataset_to_table(ds) -> pa.Table:
    """Materialize a (small!) Dataset to one Arrow table on the driver."""
    import ray

    tables = ray.get(ds.to_arrow_refs())
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return ds.schema().base_schema.empty_table()
    return pa.concat_tables(tables, promote_options="default")
