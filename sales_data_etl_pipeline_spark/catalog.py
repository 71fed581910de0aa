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
