"""Plan-snapshot regression guard (VERDICT r3 #8): re-derive every
family operator's physical plan and diff its shuffle/sort/cartesian
structure against the bench_plans/*.txt snapshot captured by
bench_families.py.

A plan regression — a lost broadcast turning into a shuffle Exchange,
a new global Sort, an accidental CartesianProduct — now flips a test
instead of only showing up as a benchmark delta. The comparison is
COUNT-based on the structurally-dangerous node types, with "≤ snapshot"
semantics: the test fixture's corpus is tiny, so Catalyst may broadcast
MORE (fewer shuffles) than at the 500k-doc snapshot scale, which is
fine; it must never shuffle or sort more. After an intentional plan
change, refresh snapshots with `python bench_families.py`.
"""

import os
import re
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(REPO, "bench_plans")
sys.path.insert(0, REPO)

from bench_families import (  # noqa: E402
    _gen_documents,
    _gen_embeddings,
    _gen_media,
    family_centroids,
    family_ops,
    normalize_op,
)

# node types whose COUNT growing vs the snapshot is a plan regression
GUARDED = ("Exchange", "Sort", "CartesianProduct", "BroadcastNestedLoopJoin")
# tree lines look like "+- Exchange (25)" / ":- * Sort (5)"; the detail
# section repeats names as "(25) Exchange" and must not be counted
_TREE_NODE = re.compile(r"[+:]- (?:\* )?(\w+)")


def _node_counts(plan_text: str) -> dict:
    counts: dict = {}
    for line in plan_text.splitlines():
        if not line.strip():
            break  # end of the tree section
        m = _TREE_NODE.search(line)
        if m:
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


@pytest.fixture(scope="module")
def fam(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("fam")
    dp, vp, mp = str(root / "docs"), str(root / "vecs"), str(root / "media")
    _gen_documents(spark, 3000).write.parquet(dp)
    _gen_embeddings(spark, 2000, 64).write.parquet(vp)
    _gen_media(spark, 600).write.parquet(mp)
    docs = spark.read.parquet(dp)
    vecs = spark.read.parquet(vp)
    media = spark.read.parquet(mp)
    queries = (
        vecs.filter(F.col("vec_id") % 20 == 0)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        .cache()
    )
    queries.count()
    srcd = docs.select(
        "doc_id",
        F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20)).cast("int")).alias(
            "source"
        ),
    )
    return family_ops(docs, vecs, queries, srcd, family_centroids(), media=media)


def _snapshot_names():
    if not os.path.isdir(PLANS_DIR):
        return []
    return sorted(n[:-4] for n in os.listdir(PLANS_DIR) if n.endswith(".txt"))


@pytest.mark.parametrize("name", _snapshot_names())
def test_plan_matches_snapshot_structure(spark, fam, name):
    assert name in fam, (
        f"snapshot bench_plans/{name}.txt has no family op — remove the "
        "stale snapshot or re-add the op to bench_families.family_ops"
    )
    with open(os.path.join(PLANS_DIR, f"{name}.txt")) as f:
        snap_counts = _node_counts(f.read())

    # the plan variant: ops that eagerly checkpoint their result build
    # the lazy form here, so the guard sees the real join tree rather
    # than a vacuous Scan ExistingRDD
    df = normalize_op(fam[name])[1]()
    live = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    live_counts = _node_counts(live)

    regressions = {
        node: (snap_counts.get(node, 0), live_counts.get(node, 0))
        for node in GUARDED
        if live_counts.get(node, 0) > snap_counts.get(node, 0)
    }
    assert not regressions, (
        f"{name}: plan grew dangerous nodes vs bench_plans/{name}.txt "
        f"(snapshot_count, live_count) = {regressions}. If intentional, "
        "refresh snapshots with `python bench_families.py`.\n\n" + live
    )


def test_every_family_op_has_a_snapshot(fam):
    missing = sorted(set(fam) - set(_snapshot_names()))
    assert not missing, (
        f"family ops without a bench_plans snapshot: {missing} — run "
        "`python bench_families.py` to capture them"
    )
