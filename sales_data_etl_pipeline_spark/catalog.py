"""Catalog bootstrap + run metrics (reference S10/S11).

S10: the reference creates a PostgreSQL user + database with existence
probes (``create-user-database/create_user_database.py:54-178``); the
engine equivalent is idempotent catalog DDL (auth is out of scope for an
embedded engine).

S11: the reference logs per-step timing and row counts; the engine uses
``df.observe`` — metrics ride the existing action, no extra pass over
the data (a separate ``count()`` would re-scan).
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def ensure_database(spark: SparkSession, name: str) -> None:
    """Idempotent CREATE DATABASE (reference probes pg_database first;
    IF NOT EXISTS is the declarative form)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def observed(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a row-count/metric observation to a plan. The observation
    resolves when the caller's action runs — zero extra scans."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs


#: Latest cap-drop summary FRAME per operator site (the banded dedup /
#: link-prediction hot-group caps — see observe_cap_drops). Refreshed
#: on every operator call; plans are immutable, so a stored frame stays
#: valid however late it is queried.
_cap_summaries: dict[str, DataFrame] = {}


def observe_cap_drops(
    df: DataFrame, site: str, dropped, dropped_rows
) -> DataFrame:
    """Register a ``(dropped_groups, dropped_rows)`` summary for the
    frequency frame feeding a hot-group cap filter, and return ``df``
    unchanged. This closes the one blind spot the 100× soak surfaced
    (r13): the max_df / max_block / max_shingle_df / max_degree caps
    are the documented bounded-reducer guards, but on a degenerate
    corpus they can exclude 100 % of groups with no signal of how much
    was dropped. ``dropped`` is the cap predicate over the frequency
    frame's columns; ``dropped_rows`` the per-group row weight (its
    frequency column).

    Deliberately LAZY, not ``Dataset.observe``: the summary is a plain
    1-row aggregate plan stored under ``site``; nothing runs unless
    :func:`cap_drop_metrics` is called, which then pays one on-demand
    aggregation job. The zero-extra-cost CollectMetrics ride-along was
    built first and measured UNRELIABLE in exactly the degenerate
    cases this exists for (r14 probes): an explicit-broadcast side
    that materializes empty loses the metrics row to AQE's empty-stage
    replan, and an operator-internal lazy ``localCheckpoint`` resolves
    the observation to a spurious zero row — a counter that silently
    under-reports on the all-duplicates corpus is worse than one that
    costs a job when queried.
    """
    _cap_summaries[site] = df.agg(
        F.coalesce(F.sum(F.when(dropped, 1)), F.lit(0)).alias(
            "dropped_groups"
        ),
        F.coalesce(F.sum(F.when(dropped, dropped_rows)), F.lit(0)).alias(
            "dropped_rows"
        ),
    )
    return df


def cap_drop_metrics(site: str) -> dict:
    """Drop counts of the LATEST operator call that registered
    ``site`` — runs the registered 1-row summary aggregate (one job
    over the operator's frequency subtree; any upstream
    ``localCheckpoint`` the operator took is reused by lineage)."""
    return _cap_summaries[site].collect()[0].asDict()


@contextmanager
def timed_step(name: str):
    """Reference-style step timing (``pipeline.py:50-69``)."""
    t0 = time.perf_counter()
    logger.info("step %s: start", name)
    try:
        yield
    except Exception:
        logger.exception("step %s: FAILED", name)
        raise
    logger.info("step %s: done in %.2fs", name, time.perf_counter() - t0)
