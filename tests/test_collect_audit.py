"""Driver-materialization audit guard.

Every ``.collect()`` / ``.first()`` / ``.toPandas()`` in non-test
source is a driver round-trip: bounded ones are how this engine keeps
iterative state exact (k-row medoid tables, d-bounded centroids,
enum-bounded transition matrices -- each with a documented cap), but an
UNbounded one is the classic "it's not distributed" failure, invisible
at test scale.  This guard pins the per-file inventory with a written
boundedness argument; adding a driver round-trip anywhere forces an
edit HERE (stating the new site's cap), and removing one forces the
stale entry to be cleaned up.  The same mechanism class as
tools/plan_lint.py's justification-required whitelist.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "mapreduce6240project_spark"
)

PATTERN = re.compile(r"\.collect\(\)|\.first\(\)|\.toPandas\(\)")

#: relative path -> (expected site count, boundedness argument)
INVENTORY: dict[str, tuple[int, str]] = {
    "plans/extensions.py": (1, "query-vector probe: 1 row by key"),
    "plans/text_corpus.py": (
        2,
        "vocab total (1-row agg) + diameter argmax (limit 1)",
    ),
    "plans/vectors_ext.py": (1, "centroid: d-bounded dims table"),
    "plans/behavior.py": (
        1,
        "Markov transition matrix, hard-erroring above 4096 rows",
    ),
    "plans/retrieval.py": (
        4,
        "query-vector/label probes: 1 row by key each (4th site: "
        "map_at10's qlabel first(), same vec_id=0 point lookup)",
    ),
    "streaming/jobs.py": (1, "watermark cutoff scalar (1-row agg)"),
    "sources/txlog.py": (
        2,
        "MERGE/DELETE affected-file lists: distinct input_file_name "
        "values, bounded by the table's data-file count (the commit "
        "log's removes list must hold them anyway)",
    ),
    "plans/engineering.py": (
        2,
        "txlog_skipping_audit key-domain max + txlog_zorder_2d_audit "
        "day-domain min/max: 1-row agg scalars that derive the "
        "scale-relative prune ranges",
    ),
    "operators/sampling.py": (
        2,
        "per-stratum counts: strata are enum-bounded group keys",
    ),
    "operators/textstats.py": (
        2,
        "pack_chunks per-partition sums (#partitions rows) + BPE merge "
        "argmax (1 row per learned merge, vocab-bounded rounds)",
    ),
    "operators/dedup.py": (
        3,
        "adaptive pre-probe max group size + candidate-text byte probe "
        "for the broadcast gate + hot-bucket sample-probe max bucket "
        "count (1-row aggs each)",
    ),
    "operators/clustering.py": (
        4,
        "k-medoids driver state: k seeds, C-row exact combo table "
        "(cap-guarded), k updated medoids per round",
    ),
    "operators/vectors.py": (
        8,
        "k-means/PCA/k-center driver state: d-bounded centroids and "
        "covariance (d^2), 1-row counts/probes, limit-1 argmax picks; "
        "adaptive paths switch to distributed twins above the cap",
    ),
    "operators/graph.py": (
        4,
        "CC edge list below the documented driver cap (distributed "
        "label propagation above it) + 1-row triangle/wedge counts",
    ),
    "operators/sketch.py": (1, "m-row sketch fold (log-bucket bounded)"),
    "operators/similarity.py": (
        7,
        "ANN driver state: k centroids, query signature/vector probes "
        "(keyed 1-row), brute-force fallback below the adaptive cap "
        "with distributed twin above",
    ),
    "operators/retrieval.py": (
        4,
        "query-document probe (1 row by key) + query-likelihood "
        "collection stats: NT (1-row agg) and per-term ctf "
        "(|query_terms| rows) + RM3 corpus stats (one 2-int agg row, "
        "same contract as bm25_scores)",
    ),
    "operators/prefix.py": (
        1,
        "range-exchange offsets: one row per partition (cluster-config "
        "bounded)",
    ),
}


def _scan() -> dict[str, int]:
    found: dict[str, int] = {}
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        n = 0
        for line in py.read_text().splitlines():
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            n += len(PATTERN.findall(line))
        if n:
            found[rel] = n
    return found


def test_driver_materialization_inventory_is_pinned():
    found = _scan()
    expected = {k: v[0] for k, v in INVENTORY.items()}
    new_files = sorted(set(found) - set(expected))
    assert new_files == [], (
        f"driver round-trips in unaudited files: "
        f"{[(f, found[f]) for f in new_files]} -- add INVENTORY entries "
        f"with a boundedness argument"
    )
    stale_files = sorted(set(expected) - set(found))
    assert stale_files == [], (
        f"stale INVENTORY entries (no sites left): {stale_files}"
    )
    drift = {
        f: (expected[f], found[f])
        for f in expected
        if expected[f] != found[f]
    }
    assert drift == {}, (
        f"site-count drift (expected, found): {drift} -- update the "
        f"entry AND its boundedness argument"
    )


def test_every_inventory_entry_has_a_real_argument():
    for f, (_n, why) in INVENTORY.items():
        assert len(why) >= 15, f"{f}: justification too thin"
