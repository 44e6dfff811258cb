"""Per-ref snapshot retention (Iceberg semantics): a BRANCH protects
its ANCESTRY (governed by per-ref min-snapshots-to-keep /
max-snapshot-age-ms, falling back to the table's history.expire.*
properties), a TAG pins exactly its snapshot, and max-ref-age-ms ages
out stale refs so they stop pinning snapshots forever. Reference
behavioral precedent: the exporter's hourly-commit cadence
(internal/iceberg/catalog_rest.go:243-303) makes retention policy the
top operational knob on these tables; the retention rules themselves
are the public Iceberg spec's (RemoveSnapshots / SnapshotRef fields).

Both transports are covered, plus a raced expire-vs-branch-commit
test: the expire CAS loses to a concurrent branch append and the
re-plan must protect the NEW branch head's ancestry.
"""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

from opentelemetry_iceberg_exporter_spark.sinks.iceberg_fs import (
    FsCatalog,
    expire_plan,
)

from rest_stub import make_server


def _df(spark, n=20, tag=""):
    return (
        spark.range(n)
        .withColumn("ts", F.to_timestamp(F.lit("2024-03-01 00:00:00")))
        .withColumn("v", F.lit(tag))
    )


DAY_MS = 86400 * 1000


@pytest.fixture()
def fs_table(spark, tmp_path):
    cat = FsCatalog(str(tmp_path / "wh"))
    return cat.create_table("otel", "ret", _df(spark).schema, partition_source="ts")


def _ids(t):
    return {s["snapshot-id"] for s in t.snapshots()}


class TestBranchAncestryRetention:
    def test_branch_protects_ancestry_not_just_head(self, spark, fs_table):
        """The round-6 gap: expiry on a table with a WAP audit branch
        used to keep only the branch HEAD — time travel and changelog
        along the branch were silently destroyed."""
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        s3 = t.append_dataframe(_df(spark, tag="v3"))
        t.set_ref("audit", s3, "branch")
        s4 = t.append_dataframe(_df(spark, tag="v4"))
        s5 = t.append_dataframe(_df(spark, tag="v5"))
        t.expire_snapshots(keep_last=1)
        ids = _ids(t)
        # main keeps its head; the branch keeps its WHOLE (fresh)
        # ancestry under the default 5-day max-snapshot-age
        assert ids == {s1, s2, s3, s5}
        assert s4 not in ids  # main-only history outside keep_last
        # branch history is genuinely readable, not just the head
        assert t.read_ref(spark, "audit").count() == 60
        assert t.read(spark, snapshot_id=s2).count() == 40  # time travel
        assert t.read(spark).count() == 100

    def test_branch_commits_beyond_fork_are_protected(self, spark, fs_table):
        t = fs_table
        t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        t.set_ref("audit", s2, "branch")
        b1 = t.append_dataframe_to_branch("audit", _df(spark, tag="b1"))
        b2 = t.append_dataframe_to_branch("audit", _df(spark, tag="b2"))
        t.append_dataframe(_df(spark, tag="v3"))
        t.expire_snapshots(keep_last=1)
        ids = _ids(t)
        assert {s2, b1, b2} <= ids
        # the branch's intermediate commit stays time-travelable
        assert t.read(spark, snapshot_id=b1).count() == 60
        assert t.read_ref(spark, "audit").count() == 80

    def test_branch_age_and_min_keep_window(self, spark, fs_table):
        """min-snapshots-to-keep is a floor under an aggressive age
        cutoff; retention stops at the first ancestor failing both
        (contiguous prefix, like Iceberg)."""
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        s3 = t.append_dataframe(_df(spark, tag="v3"))
        t.set_ref(
            "audit",
            s3,
            "branch",
            min_snapshots_to_keep=2,
            max_snapshot_age_ms=1,
        )
        # age everything out: evaluate "now" 10 days in the future
        future = int(time.time() * 1000) + 10 * DAY_MS
        t.expire_snapshots(keep_last=1, now_ms=future)
        ids = _ids(t)
        assert ids == {s3, s2}  # head + 1 more (min keep 2); s1 aged out
        assert s1 not in ids

    def test_table_history_expire_defaults_govern_branches(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        s3 = t.append_dataframe(_df(spark, tag="v3"))
        t.set_properties({"history.expire.max-snapshot-age-ms": "1"})
        t.set_ref("audit", s3, "branch")
        future = int(time.time() * 1000) + 10 * DAY_MS
        t.expire_snapshots(keep_last=1, now_ms=future)
        # table-level age default applies: branch keeps only its head
        # (min-snapshots-to-keep default 1)
        assert _ids(t) == {s3}
        assert s1 not in _ids(t) and s2 not in _ids(t)


class TestRefAging:
    def test_stale_tag_ages_out_and_unpins(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        t.set_ref("release-1", s1, "tag", max_ref_age_ms=1000)
        future = int(time.time() * 1000) + 10 * DAY_MS
        t.expire_snapshots(keep_last=1, now_ms=future)
        assert "release-1" not in t.metadata().get("refs", {})
        assert _ids(t) == {s2}
        # s1's DATA files live on (s2's append carries its manifests);
        # only the dropped snapshot's manifest list is reclaimable —
        # and the table still reads in full
        assert t.read(spark).count() == 40

    def test_fresh_tag_still_pins(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        t.set_ref("release-1", s1, "tag", max_ref_age_ms=30 * DAY_MS)
        t.expire_snapshots(keep_last=1)
        assert "release-1" in t.metadata()["refs"]
        assert _ids(t) == {s1, s2}

    def test_table_default_max_ref_age(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        t.set_properties({"history.expire.max-ref-age-ms": "1000"})
        t.set_ref("release-1", s1, "tag")
        t.set_ref("audit", s2, "branch")
        future = int(time.time() * 1000) + 10 * DAY_MS
        t.expire_snapshots(keep_last=1, now_ms=future)
        refs = t.metadata().get("refs", {})
        # main NEVER ages out; every other ref did
        assert set(refs) == {"main"}
        assert _ids(t) == {s2}

    def test_main_never_ages_out(self, spark, fs_table):
        t = fs_table
        t.append_dataframe(_df(spark, tag="v1"))
        t.set_properties({"history.expire.max-ref-age-ms": "1"})
        future = int(time.time() * 1000) + 100 * DAY_MS
        t.expire_snapshots(keep_last=1, now_ms=future)
        assert "main" in t.metadata()["refs"]
        assert t.read(spark).count() == 20


class TestRefValidationAndPreservation:
    def test_tag_refuses_branch_only_settings(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        with pytest.raises(ValueError, match="branches"):
            t.set_ref("x", s1, "tag", min_snapshots_to_keep=2)
        with pytest.raises(ValueError, match="branches"):
            t.set_ref("x", s1, "tag", max_snapshot_age_ms=1000)
        with pytest.raises(ValueError, match="positive"):
            t.set_ref("x", s1, "branch", min_snapshots_to_keep=0)

    def test_branch_advance_preserves_retention(self, spark, fs_table):
        """Commits that move a branch head must not reset its expiry
        policy (the ref dict is rebuilt on every commit)."""
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        t.set_ref(
            "audit",
            s1,
            "branch",
            min_snapshots_to_keep=7,
            max_snapshot_age_ms=9 * DAY_MS,
            max_ref_age_ms=30 * DAY_MS,
        )
        t.append_dataframe_to_branch("audit", _df(spark, tag="b1"))
        ref = t.metadata()["refs"]["audit"]
        assert ref["min-snapshots-to-keep"] == 7
        assert ref["max-snapshot-age-ms"] == 9 * DAY_MS
        assert ref["max-ref-age-ms"] == 30 * DAY_MS

    def test_main_advance_preserves_retention(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        t.set_ref("main", s1, "branch", min_snapshots_to_keep=5)
        t.append_dataframe(_df(spark, tag="v2"))
        assert t.metadata()["refs"]["main"]["min-snapshots-to-keep"] == 5
        # and expire honors it as main's floor even with keep_last=1
        s3 = t.append_dataframe(_df(spark, tag="v3"))
        t.expire_snapshots(keep_last=1)
        assert len(_ids(t)) == 3  # min-snapshots-to-keep=5 floors at all 3


class TestRacedExpireVsBranchCommit:
    def test_expire_replans_around_concurrent_branch_append(
        self, spark, fs_table, monkeypatch
    ):
        """The expire CAS loses to a branch append landing first; the
        retry re-plans against the new base and must protect the NEW
        branch head and its ancestry."""
        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod

        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        t.set_ref("audit", s2, "branch")
        s3 = t.append_dataframe(_df(spark, tag="v3"))  # main-only: expirable
        s4 = t.append_dataframe(_df(spark, tag="v4"))

        real_write = fsmod._write_metadata_version
        state = {"raced": False, "in_race": False, "branch_head": None}

        def raced(location, version, md):
            if state["raced"] or state["in_race"]:
                return real_write(location, version, md)
            # first expire CAS: let a branch append land FIRST, then
            # attempt the (now-conflicting) original write
            state["raced"] = True
            state["in_race"] = True
            try:
                state["branch_head"] = t.append_dataframe_to_branch(
                    "audit", _df(spark, tag="raced")
                )
            finally:
                state["in_race"] = False
            return real_write(location, version, md)  # raises CommitConflict

        monkeypatch.setattr(fsmod, "_write_metadata_version", raced)
        t.expire_snapshots(keep_last=1)
        assert state["raced"] and state["branch_head"] is not None
        ids = _ids(t)
        # the raced-in branch commit AND its whole (fresh) ancestry
        # survived; the main-only middle snapshot expired
        assert {state["branch_head"], s2, s1, s4} <= ids
        assert s3 not in ids
        assert t.read_ref(spark, "audit").count() == 60
        assert t.read(spark).count() == 80  # main = s4


class TestRestRetention:
    @pytest.fixture()
    def rest_table(self, spark, tmp_path):
        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
                RestCatalogClient,
            )

            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            yield client.ensure_table(
                "otel", "ret", _df(spark).schema, partition_source="ts"
            )
        finally:
            server.shutdown()

    def test_branch_ancestry_protected_over_rest(self, spark, rest_table):
        t = rest_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        t.set_ref("audit", s2, "branch")
        b1 = t.append_dataframe_to_branch("audit", _df(spark, tag="b1"))
        s3 = t.append_dataframe(_df(spark, tag="v3"))
        t.expire_snapshots(keep_last=1)
        ids = {s["snapshot-id"] for s in t.snapshots()}
        assert {s1, s2, b1, s3} <= ids  # s1 is in the audit ancestry
        assert t.read_ref(spark, "audit").count() == 60

    def test_stale_ref_removed_over_rest(self, spark, rest_table):
        t = rest_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        s2 = t.append_dataframe(_df(spark, tag="v2"))
        t.set_ref("release-1", s1, "tag", max_ref_age_ms=1000)
        future = int(time.time() * 1000) + 10 * DAY_MS
        t.expire_snapshots(keep_last=1, now_ms=future)
        assert "release-1" not in t.metadata().get("refs", {})
        assert {s["snapshot-id"] for s in t.snapshots()} == {s2}
        assert t.read(spark).count() == 40

    def test_rest_branch_advance_preserves_retention(self, spark, rest_table):
        t = rest_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        t.set_ref("audit", s1, "branch", min_snapshots_to_keep=4)
        t.append_dataframe_to_branch("audit", _df(spark, tag="b1"))
        assert t.metadata()["refs"]["audit"]["min-snapshots-to-keep"] == 4
        # main advance preserves main's settings too
        t.set_ref("main", t.current_snapshot()["snapshot-id"], "branch",
                  max_snapshot_age_ms=9 * DAY_MS)
        t.append_dataframe(_df(spark, tag="v2"))
        assert t.metadata()["refs"]["main"]["max-snapshot-age-ms"] == 9 * DAY_MS


class TestExpirePlanUnit:
    """Pure-planner cases over fabricated metadata (no Spark writes):
    the contiguous-prefix rule and unreferenced-snapshot aging."""

    def _md(self, chain, refs=None, props=None):
        # chain: list of (sid, parent, ts)
        return {
            "snapshots": [
                {
                    "snapshot-id": sid,
                    **({"parent-snapshot-id": p} if p is not None else {}),
                    "timestamp-ms": ts,
                    "summary": {"operation": "append"},
                    "manifest-list": f"/nonexistent/ml-{sid}.avro",
                }
                for sid, p, ts in chain
            ],
            "refs": refs or {},
            "properties": props or {},
            "current-snapshot-id": chain[-1][0] if chain else -1,
        }

    def test_contiguous_prefix_stops_at_first_failure(self, monkeypatch):
        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod

        monkeypatch.setattr(
            fsmod, "snapshot_file_tree", lambda s, memo=None: (set(), set())
        )
        # ancestry 5<-4<-3<-2<-1 (head 5); 3 is OLD, 2 and 1 are fresh
        # (out-of-order timestamps): retention must stop AT 3 and not
        # resurrect 2/1 behind the hole
        now = 1_000_000_000_000
        md = self._md(
            [
                (1, None, now - 1000),
                (2, 1, now - 1000),
                (3, 2, now - 50 * DAY_MS),
                (4, 3, now - 1000),
                (5, 4, now - 1000),
            ],
            refs={"b": {"snapshot-id": 5, "type": "branch"}},
        )
        plan = expire_plan(md, keep_last=0, older_than_ms=None, now_ms=now)
        retained = {s["snapshot-id"] for s in plan["retained"]}
        assert retained == {5, 4}  # stop at 3; 2/1 NOT retained via b

    def test_unreferenced_snapshots_age_by_older_than(self, monkeypatch):
        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod

        monkeypatch.setattr(
            fsmod, "snapshot_file_tree", lambda s, memo=None: (set(), set())
        )
        now = 1_000_000_000_000
        # 10 is an abandoned fork (unreferenced); fresh vs stale
        md = self._md(
            [(1, None, now - 9000), (2, 1, now - 8000), (10, 1, now - 7000)],
            refs={"main": {"snapshot-id": 2, "type": "branch"}},
        )
        # cutoff BEFORE the fork's commit: the abandoned fork survives
        plan = expire_plan(md, keep_last=1, older_than_ms=now - 7500, now_ms=now)
        retained = {s["snapshot-id"] for s in plan["retained"]}
        assert 10 in retained and 1 not in retained
        # prune-now (no age axis anywhere): the fork goes too
        plan = expire_plan(md, keep_last=1, older_than_ms=None, now_ms=now)
        retained = {s["snapshot-id"] for s in plan["retained"]}
        assert retained == {2}

    def test_nothing_to_do_returns_none(self):
        md = self._md(
            [(1, None, 1_000)],
            refs={"main": {"snapshot-id": 1, "type": "branch"}},
        )
        assert expire_plan(md, keep_last=1, older_than_ms=None, now_ms=2_000) is None


class TestMainStaysBranch:
    def test_main_cannot_become_a_tag(self, spark, fs_table):
        t = fs_table
        s1 = t.append_dataframe(_df(spark, tag="v1"))
        with pytest.raises(ValueError, match="main must stay a branch"):
            t.set_ref("main", s1, "tag")


class TestExpirePlanningCost:
    def test_shared_manifests_read_once_per_plan(self, spark, fs_table, monkeypatch):
        """Expire planning over N micro-batch snapshots touches O(N)
        distinct manifests but O(N^2) manifest LINKS (each append
        carries all priors forward) — the plan must read each manifest
        once, or expiry cost explodes with history length."""
        t = fs_table
        for i in range(8):
            t.append_dataframe(_df(spark, tag=f"v{i}"))
        from opentelemetry_iceberg_exporter_spark.sinks import iceberg_fs as fsmod

        reads: list[str] = []
        real = fsmod.read_ocf

        def counting(path, *a, **k):
            if path.endswith(".avro") and not os.path.basename(path).startswith(
                "snap-"
            ):
                reads.append(path)
            return real(path, *a, **k)

        monkeypatch.setattr(fsmod, "read_ocf", counting)
        plan = fsmod.expire_plan(t.metadata(), keep_last=2)
        assert plan is not None and plan["expired"]
        assert reads and len(reads) == len(set(reads))


class TestRestExpireRace:
    def test_rest_expire_replans_when_a_ref_moves(self, spark, tmp_path):
        """The REST expire pins every ref it planned against; a branch
        commit landing in between 409s the stale plan and the retry
        re-plans — the raced-in branch head's ancestry survives."""
        from opentelemetry_iceberg_exporter_spark.sinks.iceberg_rest import (
            RestCatalogClient,
        )

        warehouse = str(tmp_path / "rwh")
        os.makedirs(warehouse)
        server, _, uri = make_server(warehouse)
        try:
            client = RestCatalogClient(uri, warehouse=warehouse)
            client.ensure_namespace("otel")
            t = client.ensure_table("otel", "rx", _df(spark).schema,
                                    partition_source="ts")
            s1 = t.append_dataframe(_df(spark, tag="v1"))
            s2 = t.append_dataframe(_df(spark, tag="v2"))
            t.set_ref("audit", s2, "branch")
            s3 = t.append_dataframe(_df(spark, tag="v3"))
            s4 = t.append_dataframe(_df(spark, tag="v4"))

            # make the FIRST expire commit lose: the plan expires the
            # main-only middle snapshot s3, and the race moves the audit
            # branch onto s4 — s3 is then on the branch's ANCESTRY, so
            # committing the stale plan would punch a hole in branch
            # history. The re-plan must retain it.
            real_commit = client.commit_table
            state = {"raced": False}

            def racing_commit(namespace, name, requirements, updates):
                is_expire = any(
                    u.get("action") == "remove-snapshots" for u in updates
                )
                if is_expire and not state["raced"]:
                    state["raced"] = True
                    t.set_ref("audit", s4, "branch")
                return real_commit(namespace, name, requirements, updates)

            client.commit_table = racing_commit
            try:
                t.expire_snapshots(keep_last=1)
            finally:
                client.commit_table = real_commit
            assert state["raced"]
            ids = {s["snapshot-id"] for s in t.snapshots()}
            # WITHOUT the per-ref assertions the stale plan lands and s3
            # is destroyed despite being branch-protected by the race
            assert {s1, s2, s3, s4} <= ids
            assert t.read(spark, snapshot_id=s3).count() == 60
            assert t.read_ref(spark, "audit").count() == 80
        finally:
            server.shutdown()
