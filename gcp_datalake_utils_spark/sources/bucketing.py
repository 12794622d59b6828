"""Bucketed table layout: the 100 TB co-located-join strategy.

Big fact-fact joins (lineitem ⋈ orders on orderkey) shuffle both sides
every query unless the storage layout pre-partitions them. Writing both
tables bucketed by the join key with the same bucket count lets Spark
plan the join shuffle-free (bucket pruning + co-located scans).

``write_bucketed`` persists a DataFrame as a bucketed managed table;
``assert_no_shuffle_join`` is the test hook proving the plan has no
Exchange on the bucketed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 16,
                   sort_cols: list[str] | None = None,
                   path: str | None = None) -> None:
    """Persist as a bucketed (and optionally sorted) table — sorted
    buckets additionally enable merge-join without sorting. Replaces an
    existing table, clearing any orphaned location left by an
    interrupted earlier write. With ``path`` the table is external at
    ``path/<table>`` (host-warehouse-independent — the warehouse dir is
    a static conf a host session may point anywhere)."""
    import shutil
    from urllib.parse import urlparse
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is not None:
        loc = f"{path.rstrip('/')}/{table.lower()}"
        shutil.rmtree(loc, ignore_errors=True)
    else:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        # orphan-location cleanup applies only to local, unqualified
        # managed tables; remote warehouses (gs://, hdfs://) and
        # qualified names resolve elsewhere and are left to the catalog
        if wh.scheme in ("", "file") and "." not in table:
            shutil.rmtree(
                f"{(wh.path or wh.geturl()).rstrip('/')}/{table.lower()}",
                ignore_errors=True)
    w = (df.write.mode("overwrite")
         .bucketBy(buckets, key))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", loc)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str,
                  left_key: str, right_key: str) -> DataFrame:
    l_df = spark.table(left)
    r_df = spark.table(right)
    return l_df.join(r_df, l_df[left_key] == r_df[right_key])


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan repartitions data across the cluster —
    any Exchange node (hash, range, round-robin, single-partition)
    except BroadcastExchange, which moves a small build side, not the
    data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        "Exchange" in ln and "BroadcastExchange" not in ln
        for ln in plan.splitlines())
