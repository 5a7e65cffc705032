"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline (WAL tail → LWW upsert merge
→ exactly-once committed Parquet → read back) at sf0.001 scale;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see
wprdc_etl_ray/pipelines/queries.py for the precision policy).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001-scale events."""
    from wprdc_etl_ray.pipelines.queries import q_cdc_flagship

    return q_cdc_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from wprdc_etl_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from wprdc_etl_ray.pipelines.queries import oracle_sql as _o

    return _o()
