"""Plan audit: flag duplicated expensive interpreted expressions per query.

Round 8 found three instances of one pathology class: an expensive
interpreted expression (regex tokenize, HOF fold, Python UDF argument)
appearing MANY times in a physical plan because Catalyst neither
common-subexpression-eliminates inside lambda bodies nor collapses
projections whose aliases are referenced more than once — clean_corpus
carried 15 copies of the token split, language_id 8, ann_topk_ivf
evaluated its cell-assign UDF (with an O(d²) argument) twice.  This tool
makes that class *auditable*: for every catalog query it counts, in the
executed-plan string, the occurrences of each expensive-expression marker
and prints the queries whose counts exceed a threshold, with the distinct
source columns involved.

Usage:
    python tools/plan_audit.py [SF_DIR] [--threshold N] [--only a,b,c]

A flagged query is not automatically wrong — two genuine input scans
legitimately tokenize twice (tfidf's two branches before the r8 pin), and
a `split` on two DIFFERENT columns is two different jobs — but every
flagged row deserves the question "is this the same expression evaluated
more than once per row?".  The plan gates in tests/test_plans.py pin the
fixed shapes; this script is the discovery end of that loop.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# marker -> compiled pattern. Each match is one occurrence of an expensive
# interpreted evaluation site in the plan.
MARKERS = {
    "split": re.compile(r"split\("),
    "regexp": re.compile(r"regexp_(?:replace|extract|extract_all)\("),
    "hof_fold": re.compile(r"aggregate\(transform\("),
    "transform": re.compile(r"(?<![_a-z])transform\("),
    "python_udf": re.compile(r"ArrowEvalPython|BatchEvalPython"),
}

SKIP_PREFIXES = ("streaming_",)  # streams need a sink to plan; skip


def _strip_cached_subtrees(plan: str) -> str:
    """Drop InMemoryRelation cached-child plans from the tree text.

    A ``_pinned`` frame prints its ORIGINAL child plan under the
    InMemoryRelation node even though execution reads the cache — counting
    markers there reports expressions that never re-evaluate (bm25's
    pinned tf subtree reads as 5 phantom splits). Lines indented deeper
    than the most recent InMemoryRelation line belong to its cached plan.
    """
    out, skip_indent = [], None
    for line in plan.splitlines():
        indent = len(line) - len(line.lstrip(" :+-"))
        if skip_indent is not None and indent > skip_indent:
            continue
        skip_indent = None
        if "InMemoryRelation" in line:
            skip_indent = indent
            continue
        out.append(line)
    return "\n".join(out)


def audit(spark, sf_dir: str, names, threshold: int):
    import __spark_entry__ as se

    qs = se.queries()
    flagged = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        if name.startswith(SKIP_PREFIXES):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print(f"SKIP {name}: {type(exc).__name__}", file=sys.stderr)
            continue
        live = _strip_cached_subtrees(plan)
        counts = {m: len(p.findall(live)) for m, p in MARKERS.items()}
        # rescan detector: the same source file scanned repeatedly in the
        # LIVE plan — a multi-pass shape and a pin candidate when the
        # passes re-derive expensive columns (median/MAD's two passes are
        # legitimate; five scans of documents.parquet rarely are)
        scans = re.findall(r"InMemoryFileIndex\(1 paths\)\[([^\]]+)\]", live)
        if scans:
            top = max((scans.count(s) for s in set(scans)))
            counts["rescan"] = top
        hot = {m: c for m, c in counts.items() if c >= threshold}
        if hot:
            flagged.append((name, hot))
        # release any pins the query creation materialized
        from ffn_polars_spark.operators.dedup import release_pins

        release_pins()
    return flagged


def main() -> None:
    argv = list(sys.argv[1:])
    threshold = 3
    if "--threshold" in argv:
        i = argv.index("--threshold")
        threshold = int(argv[i + 1])
        del argv[i : i + 2]
    names = None
    if "--only" in argv:
        i = argv.index("--only")
        names = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"

    from ffn_polars_spark.sources import configure, get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    configure(spark)

    flagged = audit(spark, sf_dir, names, threshold)
    print(f"\n== {len(flagged)} queries with any marker >= {threshold}:")
    for name, hot in sorted(flagged, key=lambda x: -max(x[1].values())):
        desc = ", ".join(f"{m} x{c}" for m, c in sorted(hot.items()))
        print(f"  {name}: {desc}")


if __name__ == "__main__":
    main()
