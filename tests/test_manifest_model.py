"""Model-based check of the manifest DML surface: a seeded random
sequence of commit/overwrite/delete_where/update_where/compact_table/
merge_into (plain and schema-EVOLVING) ops runs against both the real
versioned table and a pure-Python dict model; after EVERY op the latest read must equal the model, a
stats-pruned read must equal the model filter, and a random historical
version must still equal its recorded snapshot (time travel under
churn).  Interactions (a delete over an update over an append, a
compact materializing both, pruning across all of it) are exactly
where single-feature tests miss bugs."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.readers import table

N_OPS = 12


def _to_model(rows):
    # value = (p, q) — q is the column an evolving merge may add
    # mid-sequence; None before evolution / for NULL-filled old rows
    out = {}
    for r in rows:
        q = int(r.q) if "q" in r.__fields__ and r.q is not None else None
        out[int(r.k)] = (int(r.p), q)
    return out


def _read_model(spark, t, version=None):
    return _to_model(M.read_version(spark, t, version).collect())


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_random_dml_sequence_matches_model(spark, sf_dir, seed, tmp_path):
    rng = random.Random(seed)
    t = str(tmp_path / f"tbl{seed}")

    # integer-cent universe keyed by unique o_orderkey
    universe = {
        int(r.k): int(r.p)
        for r in table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") * 100).cast("long").alias("p"),
        )
        .limit(600)
        .collect()
    }
    all_keys = sorted(universe)
    unused = list(all_keys)
    rng.shuffle(unused)

    def frame(keys):
        return spark.createDataFrame(
            [(k, universe[k]) for k in sorted(keys)], "k long, p long"
        )

    def take(n):
        got = unused[:n]
        del unused[:n]
        return got

    # v1: initial commit.  model value = (p, q); q is None until an
    # evolving merge adds the column (and resets on overwrite, which
    # starts a fresh schema)
    model: dict[int, tuple] = {}
    first = take(120)
    model.update({k: (universe[k], None) for k in first})
    M.commit(frame(first).repartition(3), t)
    history = {1: dict(model)}
    #: schema state per recorded version — restore rolls the logical
    #: schema back with the data, so the harness must roll its own
    #: evolved flag back too
    evolved_at = {1: False}
    evolved = False

    for step in range(N_OPS):
        op = rng.choice(
            [
                "append",
                "delete",
                "update",
                "compact",
                "overwrite",
                "merge",
                "evolve",
                "merge_race",
                "compact_race",
                "delete_race",
                "restore",
            ]
        )
        if op == "restore" and len(history) > 1:
            # rollback to any RECORDED snapshot as a new version: the
            # read, pruning, and time-travel assertions below then
            # re-verify the restored state like any other op's
            hv = rng.choice(sorted(history))
            v = M.restore_table(t, hv)
            if v == hv:
                continue  # restored to the current tip: no-op
            model = dict(history[hv])
            evolved = evolved_at[hv]
        elif op == "restore":
            continue
        elif op == "delete_race" and model:
            # CONCURRENT WRITER #3 (r10): a file-disjoint delete_where
            # lands between a merge's compute and its publish — the
            # generalized rebase must land BOTH (delete held, merge
            # exact), because no file can hold rows matching both the
            # tombstone and the merge's key envelope
            big = 10_000_000 * (step + 2)
            sac_rows = [(big + i, big + i) for i in range(2)]
            sac = spark.createDataFrame(
                sac_rows, "k long, p long"
            ).coalesce(1)
            v_sac = M.commit(sac, t)  # the delete's own single file
            pre = dict(model)
            history[v_sac] = {
                **pre,
                **{k: (p, None) for k, p in sac_rows},
            }
            evolved_at[v_sac] = evolved
            upd = rng.sample(
                sorted(model), min(len(model), rng.randint(3, 12))
            )
            delta = rng.randint(1, 999)
            orig_pub = M._publish
            state = {"armed": True}

            def hooked(table_dir, build, _o=orig_pub, _s=state, _b=big):
                if _s["armed"]:
                    _s["armed"] = False
                    M.delete_where(table_dir, [("k", ">=", int(_b))])
                return _o(table_dir, build)

            M._publish = hooked
            try:
                if evolved:
                    rows = [(k, model[k][0] + delta, k % 7) for k in upd]
                    src = spark.createDataFrame(
                        sorted(rows), "k long, p long, q long"
                    )
                    v = M.merge_into(
                        spark, t, src, ["k"], evolve_schema=True
                    )
                    merged = {k: (p, q) for k, p, q in rows}
                else:
                    rows = [(k, model[k][0] + delta) for k in upd]
                    src = spark.createDataFrame(
                        sorted(rows), "k long, p long"
                    )
                    v = M.merge_into(spark, t, src, ["k"])
                    merged = {k: (p, None) for k, p in rows}
            finally:
                M._publish = orig_pub
            history[v - 1] = dict(pre)  # the interleaved delete's snap
            evolved_at[v - 1] = evolved
            model = {**pre, **merged}
        elif op == "compact_race":
            # CONCURRENT WRITER under OPTIMIZE: compaction must rebase
            # over the interleaved append (commutes), landing both —
            # the compacted rewrite of what it read plus the new rows
            pre = dict(model)
            # strictly increasing per step: a LATER race op may sample
            # an earlier race key into its own read set, so new race
            # keys must sort above everything already in the model
            big = 10_000_000 * (step + 2)
            race_rows = [
                (big + i, big + i) for i in range(rng.randint(1, 3))
            ]
            race_df = spark.createDataFrame(race_rows, "k long, p long")
            orig_pub = M._publish
            state = {"armed": True}

            def hooked(table_dir, build, _o=orig_pub, _s=state, _r=race_df):
                if _s["armed"]:
                    _s["armed"] = False
                    M.commit(_r, table_dir)
                return _o(table_dir, build)

            M._publish = hooked
            try:
                v = M.compact_table(spark, t, target_bytes=32 * 1024)
            finally:
                M._publish = orig_pub
            race_model = {k: (p, None) for k, p in race_rows}
            history[v - 1] = {**pre, **race_model}
            evolved_at[v - 1] = evolved
            model = {**pre, **race_model}
            # the interleaved rows were 2-column; compaction carried
            # their dir verbatim, so q stays NULL for them regardless
            # of the table's evolution state
        elif op == "merge_race" and model:
            # CONCURRENT WRITER: a disjoint append (huge keys, far
            # outside the merge's key envelope) lands between the
            # merge's compute and its publish; logical conflict
            # resolution must land BOTH — the append as its own
            # version, the merge rebased on top
            pre = dict(model)
            upd = rng.sample(
                sorted(model), min(len(model), rng.randint(3, 15))
            )
            delta = rng.randint(1, 999)
            # see compact_race: race keys sort above all prior keys
            big = 10_000_000 * (step + 2)
            race_rows = [
                (big + i, big + i) for i in range(rng.randint(1, 4))
            ]
            race_df = spark.createDataFrame(race_rows, "k long, p long")
            orig_pub = M._publish
            state = {"armed": True}

            def hooked(table_dir, build, _o=orig_pub, _s=state, _r=race_df):
                if _s["armed"]:
                    _s["armed"] = False
                    M.commit(_r, table_dir)
                return _o(table_dir, build)

            M._publish = hooked
            try:
                if evolved:
                    rows = [(k, model[k][0] + delta, k % 7) for k in upd]
                    src = spark.createDataFrame(
                        sorted(rows), "k long, p long, q long"
                    )
                    v = M.merge_into(
                        spark, t, src, ["k"], evolve_schema=True
                    )
                    merged = {k: (p, q) for k, p, q in rows}
                else:
                    rows = [(k, model[k][0] + delta) for k in upd]
                    src = spark.createDataFrame(
                        sorted(rows), "k long, p long"
                    )
                    v = M.merge_into(spark, t, src, ["k"])
                    merged = {k: (p, None) for k, p in rows}
            finally:
                M._publish = orig_pub
            race_model = {k: (p, None) for k, p in race_rows}
            # v-1 = the interleaved append's own snapshot
            history[v - 1] = {**pre, **race_model}
            evolved_at[v - 1] = evolved
            model = {**pre, **race_model, **merged}
        elif op in ("merge", "evolve") and model:
            upd = rng.sample(
                sorted(model), min(len(model), rng.randint(5, 25))
            )
            ins = take(rng.randint(0, 15))
            delta = rng.randint(1, 999)
            if op == "evolve" or evolved:
                # 3-column source: the first such merge WIDENS the
                # table (evolve_schema=True); later ones must supply
                # q like any post-evolution writer
                rows = [
                    (k, model[k][0] + delta, k % 7) for k in upd
                ] + [(k, universe[k], k % 7) for k in ins]
                src = spark.createDataFrame(
                    sorted(rows), "k long, p long, q long"
                )
                v = M.merge_into(
                    spark, t, src, ["k"], evolve_schema=True
                )
                evolved = True
                model.update({k: (p, q) for k, p, q in rows})
            else:
                rows = [(k, model[k][0] + delta) for k in upd] + [
                    (k, universe[k]) for k in ins
                ]
                src = spark.createDataFrame(sorted(rows), "k long, p long")
                v = M.merge_into(spark, t, src, ["k"])
                model.update({k: (p, None) for k, p in rows})
        elif op == "append" and unused:
            ks = take(rng.randint(10, 60))
            # appends stay 2-column even after evolution: the new
            # dir's rows read q as NULL (dir_schemas NULL fill)
            model.update({k: (universe[k], None) for k in ks})
            v = M.commit(frame(ks).repartition(2), t)
        elif op == "overwrite":
            ks = rng.sample(all_keys, rng.randint(30, 90))
            model = {k: (universe[k], None) for k in ks}
            # keep the invariant unused ∩ model = ∅: an overwrite may
            # resurrect never-taken keys, and a later append/merge
            # re-taking one would give the TABLE duplicate rows for
            # that key while the dict model silently collapses them
            # (latent harness bug surfaced by seed-42 fuzzing)
            ks_set = set(ks)
            unused[:] = [k for k in unused if k not in ks_set]
            v = M.commit(frame(ks).repartition(2), t, mode="overwrite")
            evolved = False  # overwrite starts a fresh schema
        elif op == "delete" and model:
            cut = rng.choice(sorted(model))
            which = rng.choice(["<=", ">"])
            v = M.delete_where(t, [("k", which, int(cut))])
            model = {
                k: pq
                for k, pq in model.items()
                if not (k <= cut if which == "<=" else k > cut)
            }
        elif op == "update" and model:
            cut = rng.choice(sorted(model))
            delta = rng.randint(1, 999)
            v = M.update_where(
                spark, t, [("k", ">=", int(cut))], {"p": F.col("p") + delta}
            )
            model = {
                k: ((p + delta if k >= cut else p), q)
                for k, (p, q) in model.items()
            }
        elif op == "compact":
            v = M.compact_table(spark, t, target_bytes=32 * 1024)
            # content unchanged
        else:
            continue
        history[v] = dict(model)
        evolved_at[v] = evolved

        got = _read_model(spark, t)
        assert got == model, f"seed={seed} step={step} op={op}"

        # stats-pruned read equals the model filter
        if model:
            cut = rng.choice(sorted(model))
            pruned = _to_model(
                M.read_version(spark, t, where=[("k", ">=", int(cut))])
                .collect()
            )
            assert pruned == {k: pq for k, pq in model.items() if k >= cut}

        # time travel: one random recorded version still matches
        hv = rng.choice(sorted(history))
        assert _read_model(spark, t, hv) == history[hv], (
            f"seed={seed} step={step} time-travel v{hv}"
        )

        # metadata COUNT is exact whenever it answers at all
        n = M.count_rows(t)
        if n is not None:
            assert n == len(model)

    # after the whole churn, the batch DataSource read (the SQL
    # surface) must agree with the model too — tombstones, merges,
    # compactions, and carried-over files all composed
    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestTableDataSource,
    )

    spark.dataSource.register(ManifestTableDataSource)
    ds = (
        spark.read.format("manifest_table").option("table_dir", t).load()
    )
    assert _to_model(ds.collect()) == model, f"seed={seed} DataSource read"
    # and a random historical version through the same surface
    hv = rng.choice(sorted(history))
    ds_v = (
        spark.read.format("manifest_table")
        .option("table_dir", t)
        .option("version", hv)
        .load()
    )
    assert _to_model(ds_v.collect()) == history[hv], (
        f"seed={seed} DataSource time-travel v{hv}"
    )
