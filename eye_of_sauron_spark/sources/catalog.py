"""Catalog / lifecycle DDL — the A15 topic-admin analog.

The reference manages its stream surface by shelling out to
``kafka-topics.sh``: create a topic with N partitions before a run
(src/utils.py:221-232), delete frame/prediction topics so a new run
does not consume stale state (utils.py:213-218, 235-244; invoked from
run_producers.py). In a Spark engine the equivalent lifecycle objects
are CATALOG ENTRIES (the queryable surface a run creates and tears
down) and CHECKPOINT DIRECTORIES (the durable stream state that, left
behind, replays exactly the "previous junk data" the reference's topic
clearing guards against). Topic partition counts have no catalog
analog — parallelism is the engine's job (shuffle partitions / AQE).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from .tables import TABLES, load_table


def create_fixture_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> list[str]:
    """``set_topic`` analog: make each fixture table queryable by name
    (CREATE OR REPLACE TEMPORARY VIEW via the DataFrame API, which is
    the same catalog operation ``spark.sql("CREATE ...")`` performs
    but keeps the nanos-timestamp loader in the path). Returns the
    registered names."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(names)


def drop_views(
    spark: SparkSession, names: tuple[str, ...] = TABLES
) -> list[str]:
    """``clear_topic`` analog: DROP VIEW IF EXISTS for each name;
    returns the names that actually existed and were dropped."""
    dropped = []
    for name in names:
        if spark.catalog.dropTempView(name):
            dropped.append(name)
    return dropped


def list_views(spark: SparkSession) -> list[str]:
    """Names currently registered in the session catalog's default
    namespace (temp views included)."""
    return sorted(t.name for t in spark.catalog.listTables())


def checkpoint_dir(root: str, name: str) -> str:
    """The per-query checkpoint location under ``root`` — one dir per
    logical stream, like one topic per camera (A9/A15)."""
    return os.path.join(root, name)


def clear_checkpoint(root: str, name: str) -> bool:
    """``clear_prediction_topics`` analog: remove a query's checkpoint
    state so a fresh run re-reads from the configured starting offsets
    instead of resuming into stale state. Returns True if state
    existed. Refuses to act on a path outside ``root`` (a relative
    ``name`` escaping upward would otherwise rm an arbitrary tree)."""
    path = os.path.abspath(checkpoint_dir(root, name))
    if not path.startswith(os.path.abspath(root) + os.sep):
        raise ValueError(f"checkpoint {name!r} escapes root {root!r}")
    if os.path.isdir(path):
        shutil.rmtree(path)
        return True
    return False
