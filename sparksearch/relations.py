"""Parent/child join-field queries: has_child, has_parent, parent_id.

The reference's `join` field type stores parent and child documents in
the SAME index (routed to the same shard so the join is shard-local) and
answers has_child / has_parent with Lucene's join queries
(modules/parent-join/src/main/java/org/opensearch/join/query/
HasChildQueryBuilder.java, HasParentQueryBuilder.java,
ParentIdQueryBuilder.java; the join field mapper keeps a `join_name`
per doc and a parent id on child docs).

Spark-native shape: one docs DataFrame carrying the same two columns —
`join_name` (the relation role of each row) and `join_parent` (the
parent's id, null on parents). The joins are then ordinary relational
algebra Catalyst can optimize:

  - has_child: filter children, aggregate per parent id (map-side
    combinable count), broadcast the small qualifying-parent-id set into
    the parents scan. Shuffle is ONE partial-aggregated pass over the
    matching children only — the analogue of the shard-local ordinal
    join, except the "routing" co-location is the aggregation key.
  - has_parent: filter parents, broadcast the matching parent ids,
    semi-join children — no shuffle of the child side at all.
  - parent_id: a plain pushed-down equality filter on the child scan.

min_children / max_children mirror HasChildQueryBuilder's bounds
(HasChildQueryBuilder.java:62-74: DEFAULT_MIN_CHILDREN=0,
DEFAULT_MAX_CHILDREN=Integer.MAX_VALUE). Scores (ScoreMode.None
filter-context) are constant; child_count is returned so callers get
the inner-hits cardinality without a second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["has_child", "has_parent", "parent_id", "children_agg",
           "parent_agg"]


def _role(docs: DataFrame, name: str,
          join_field: str = "join_name") -> DataFrame:
    return docs.filter(F.col(join_field) == F.lit(name))


def has_child(docs: DataFrame, parent_type: str, child_type: str,
              child_cond, id_field: str = "url",
              join_field: str = "join_name",
              parent_field: str = "join_parent",
              min_children: int = 1,
              max_children: int | None = None) -> DataFrame:
    """Parent docs having >= min_children (and <= max_children) children
    of `child_type` matching `child_cond`; adds `child_count`."""
    counts = (_role(docs, child_type, join_field)
              .filter(child_cond)
              .groupBy(F.col(parent_field).alias("_pid"))
              .agg(F.count(F.lit(1)).alias("child_count")))
    bound = counts.filter(F.col("child_count") >= F.lit(min_children))
    if max_children is not None:
        bound = bound.filter(F.col("child_count") <= F.lit(max_children))
    parents = _role(docs, parent_type, join_field)
    return (parents.join(F.broadcast(bound),
                         parents[id_field] == bound["_pid"])
            .drop("_pid"))


def has_parent(docs: DataFrame, parent_type: str, child_type: str,
               parent_cond, id_field: str = "url",
               join_field: str = "join_name",
               parent_field: str = "join_parent") -> DataFrame:
    """Child docs of `child_type` whose parent matches `parent_cond`."""
    pids = (_role(docs, parent_type, join_field)
            .filter(parent_cond)
            .select(F.col(id_field).alias("_pid")))
    children = _role(docs, child_type, join_field)
    return (children.join(F.broadcast(pids),
                          children[parent_field] == pids["_pid"],
                          "left_semi"))


def parent_id(docs: DataFrame, child_type: str, pid,
              join_field: str = "join_name",
              parent_field: str = "join_parent") -> DataFrame:
    """Children of one specific parent — a pushed-down equality scan
    (ParentIdQueryBuilder.java:47)."""
    return (_role(docs, child_type, join_field)
            .filter(F.col(parent_field) == F.lit(pid)))


def children_agg(docs: DataFrame, parent_type: str, child_type: str,
                 bucket, size: int = 10, parent_filter=None,
                 id_field: str = "url", join_field: str = "join_name",
                 parent_field: str = "join_parent") -> DataFrame:
    """``children`` aggregation (modules/parent-join/src/main/java/org/
    opensearch/join/aggregations/ChildrenAggregationBuilder.java,
    ParentToChildrenAggregator.java): buckets computed over PARENT docs
    step down into the child scope — each bucket's doc_count is the
    number of CHILD docs whose parent landed in the bucket.

    Spark shape: the bucketed parent table (id, key) is broadcast and
    the children are joined map-side on join_parent — the child side
    (the big one at scale) never shuffles; the only exchange is the
    final per-bucket combine, which is map-side partial-aggregated.
    ``bucket`` is any Column over the parent rows.
    """
    parents = _role(docs, parent_type, join_field)
    if parent_filter is not None:
        parents = parents.filter(parent_filter)
    b = parents.select(F.col(id_field).alias("_pid"),
                       bucket.alias("key"))
    ch = (_role(docs, child_type, join_field)
          .select(F.col(parent_field).alias("_pid")))
    return (ch.join(F.broadcast(b), "_pid")
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("key").asc())
            .limit(size))


def parent_agg(docs: DataFrame, parent_type: str, child_type: str,
               bucket, size: int = 10, child_filter=None,
               join_field: str = "join_name",
               parent_field: str = "join_parent") -> DataFrame:
    """``parent`` aggregation (ChildrenToParentAggregator.java /
    ParentAggregationBuilder.java): buckets computed over CHILD docs
    step up to the parent scope — each bucket's doc_count is the number
    of DISTINCT parent docs having at least one child in the bucket
    (a parent is counted once per bucket even with many children,
    exactly the reference's one-bit-per-parent ordinal collector).

    One shuffle on (key, parent id) for the exact distinct; ``bucket``
    is any Column over the child rows.
    """
    ch = _role(docs, child_type, join_field)
    if child_filter is not None:
        ch = ch.filter(child_filter)
    return (ch.select(bucket.alias("key"),
                      F.col(parent_field).alias("_pid"))
            .groupBy("key")
            .agg(F.countDistinct("_pid").cast("long").alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("key").asc())
            .limit(size))
