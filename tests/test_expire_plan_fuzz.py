"""Property fuzz for the per-ref retention planner (pure metadata, no
Spark): over randomized snapshot DAGs (forks, rolled-past history),
random tags/branches with random retention settings, and random
keep_last / older_than / now combinations, expire_plan must uphold the
Iceberg retention invariants:

  1. partition: expired and retained partition the snapshot set;
  2. the current snapshot and every retained ref's head are retained;
  3. aged-out refs (max-ref-age-ms, per-ref else table default) are
     removed — and never main;
  4. every retained BRANCH keeps a floor of min(min-keep, ancestry
     length) ancestors, and its retained ancestry is a contiguous
     prefix unless a deeper ancestor is protected by something else;
  5. nothing younger than the api cutoff expires;
  6. plan is None exactly when nothing expires and no ref ages out.
"""

from __future__ import annotations

import random

import pytest

from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod
from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import expire_plan

# depth/property tier: full-coverage fuzz — slow tier (SPARK_GRAFT_FULL_TESTS=1)
pytestmark = pytest.mark.slow

NOW = 1_700_000_000_000
DAY = 86_400_000


def _random_md(rng: random.Random):
    """A random snapshot DAG + refs. Chains fork off random ancestors;
    timestamps increase with snapshot id but with random gaps so age
    cutoffs bite at random depths."""
    n = rng.randint(1, 14)
    snaps = []
    by_id = {}
    ts = NOW - rng.randint(5, 40) * DAY
    for i in range(1, n + 1):
        parent = None
        if snaps and rng.random() < 0.9:
            parent = rng.choice(snaps)["snapshot-id"]
        ts += rng.randint(1, 4) * DAY
        s = {
            "snapshot-id": i,
            **({"parent-snapshot-id": parent} if parent is not None else {}),
            "timestamp-ms": ts,
            "summary": {"operation": "append"},
            "manifest-list": f"/x/ml-{i}.avro",
        }
        snaps.append(s)
        by_id[i] = s
    current = snaps[-1]["snapshot-id"]
    refs = {"main": {"snapshot-id": current, "type": "branch"}}
    for k in range(rng.randint(0, 4)):
        target = rng.choice(snaps)["snapshot-id"]
        kind = rng.choice(["tag", "branch"])
        ref = {"snapshot-id": target, "type": kind}
        if kind == "branch" and rng.random() < 0.5:
            ref["min-snapshots-to-keep"] = rng.randint(1, 4)
        if kind == "branch" and rng.random() < 0.5:
            ref["max-snapshot-age-ms"] = rng.randint(1, 30) * DAY
        if rng.random() < 0.4:
            ref["max-ref-age-ms"] = rng.randint(1, 30) * DAY
        refs[f"r{k}"] = ref
    props = {}
    if rng.random() < 0.3:
        props["history.expire.max-snapshot-age-ms"] = str(rng.randint(1, 20) * DAY)
    if rng.random() < 0.3:
        props["history.expire.max-ref-age-ms"] = str(rng.randint(1, 20) * DAY)
    if rng.random() < 0.3:
        props["history.expire.min-snapshots-to-keep"] = str(rng.randint(1, 3))
    return {
        "snapshots": snaps,
        "refs": refs,
        "properties": props,
        "current-snapshot-id": current,
    }, by_id


def _ancestry(by_id, head):
    out = []
    cur = head
    while cur is not None and cur in by_id:
        out.append(cur)
        cur = by_id[cur].get("parent-snapshot-id")
    return out


@pytest.mark.parametrize("seed", range(40))
def test_expire_plan_invariants(monkeypatch, seed):
    monkeypatch.setattr(
        fsmod, "snapshot_file_tree", lambda s, memo=None: (set(), set())
    )
    rng = random.Random(seed)
    md, by_id = _random_md(rng)
    keep_last = rng.randint(0, 4)
    older_than = (
        NOW - rng.randint(0, 35) * DAY if rng.random() < 0.5 else None
    )
    plan = expire_plan(md, keep_last, older_than, now_ms=NOW)
    all_ids = set(by_id)
    if plan is None:
        return  # invariant 6's "nothing to do" side: vacuous here
    retained = {s["snapshot-id"] for s in plan["retained"]}
    expired = {s["snapshot-id"] for s in plan["expired"]}
    removed_refs = set(plan["removed_refs"])

    # 1. partition
    assert retained | expired == all_ids
    assert not (retained & expired)
    assert expired or removed_refs  # 6: non-None means something happened

    # 2/3. refs
    assert "main" not in removed_refs
    assert md["current-snapshot-id"] in retained
    default_ref_age = (
        int(md["properties"]["history.expire.max-ref-age-ms"])
        if "history.expire.max-ref-age-ms" in md["properties"]
        else None
    )
    for name, ref in md["refs"].items():
        if name in removed_refs:
            age_limit = ref.get("max-ref-age-ms", default_ref_age)
            assert age_limit is not None
            assert NOW - by_id[ref["snapshot-id"]]["timestamp-ms"] > age_limit
            continue
        assert ref["snapshot-id"] in retained, f"live ref {name} head expired"

    # 4. branch floors + contiguity (modulo other refs' protection)
    default_min = int(
        md["properties"].get("history.expire.min-snapshots-to-keep", 1)
    )
    protected_elsewhere = set()
    for name, ref in md["refs"].items():
        if name in removed_refs:
            continue
        if ref["type"] == "tag":
            protected_elsewhere.add(ref["snapshot-id"])
    for name, ref in md["refs"].items():
        if name in removed_refs or ref["type"] != "branch":
            continue
        chain = _ancestry(by_id, ref["snapshot-id"])
        min_keep = max(
            1,
            (keep_last if name == "main" else 0),
            ref.get("min-snapshots-to-keep")
            or (default_min if name != "main" else 0),
        )
        floor = min(min_keep, len(chain))
        assert all(sid in retained for sid in chain[:floor]), (
            f"branch {name} lost part of its min-keep floor"
        )

    # 5. age guarantee: nothing younger than the api cutoff expires
    api_cutoff = older_than
    if api_cutoff is None:
        prop = md["properties"].get("history.expire.max-snapshot-age-ms")
        api_cutoff = NOW - int(prop) if prop else NOW
    for sid in expired:
        assert by_id[sid]["timestamp-ms"] < api_cutoff
