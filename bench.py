"""Headline benchmark: flagship parse->enrich->route->sink pipeline + per-sink
counts over the deterministic transcript table derived from $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "rows": R, "rows_per_sec": ...}

--scaling: run the headline pipeline at num_cpus=2 and num_cpus=8 (N vs 4N),
5 spaced alternating flagship-only repeats per leg in fresh taskset-pinned
subprocesses with per-leg cache pre-warm, and report best-of-5 throughputs
plus scaling efficiency (the sandbox proxy for N- vs 4N-node clusters,
SURVEY.md §4; measurement-validity rationale in BASELINE.md round 3).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

# Keep bench output to the one JSON line; rationale and repro live in the
# shared helper (opentelemetry_collector_contrib_ray/logquiet.py).
from opentelemetry_collector_contrib_ray.logquiet import (  # noqa: E402
    quiet_ray_data_logging)

quiet_ray_data_logging()

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf() -> float:
    from opentelemetry_collector_contrib_ray.sources.transcripts import sf_from_dir
    return sf_from_dir(SF_DIR)


def _result(queries: dict, num_cpus: int, rows: int) -> dict:
    headline = queries["flagship_e2e"]
    return {
        "metric": "flagship parse+enrich+route+sink-write wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": _sf(),
        "num_cpus": num_cpus,
        "rows": rows,
        "rows_per_sec": round(rows / headline) if headline else None,
    }


def run_once(num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    out_base = os.environ.get("GRAFT_BENCH_OUT", "/tmp/otelray_bench")
    from opentelemetry_collector_contrib_ray.pipelines.flagship import (
        build_parsed, run_flagship)
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts)
    from opentelemetry_collector_contrib_ray.stages.aggregate import count_by

    tpath = ensure_transcripts(SF_DIR)  # generation excluded from timings
    if os.environ.get("GRAFT_BENCH_PREWARM"):
        # per-leg page-cache warm: each scaling leg starts from the same
        # cache state regardless of what the previous leg did to the VM
        for f in sorted(os.listdir(tpath)):
            with open(os.path.join(tpath, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    out_root = f"{out_base}/{os.getpid()}"
    shutil.rmtree(out_root, ignore_errors=True)

    # warm-up (untimed): start the FULL worker pool (one import task per
    # CPU) + run a tiny pipeline so measured runs reflect steady state,
    # not process cold-start. The import matters: the first leg touching
    # polars-backed kernels otherwise pays ~0.5s × pool-size of one-time
    # worker imports (measured: minhash_sign 8.7s first-touch vs 1.2-2.1s
    # warm), and which leg pays it depends on bench ordering.
    import ray

    @ray.remote(num_cpus=1)
    def _warm_worker():
        import pyarrow as pa

        from opentelemetry_collector_contrib_ray.stages import (  # noqa: F401
            dedup, sessionize, tailsample)
        # exercise the polars-backed kernel once: the Rust thread pool and
        # kernel JIT-ish first-call costs are paid on first OPERATION, not
        # import
        dedup.minhash_map_fn()(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["warm up the polars hash kernel"])}))
        return 0

    ray.get([_warm_worker.remote() for _ in range(num_cpus * 2)])
    run_flagship("/root/testdata/sf0.001", os.path.join(out_root, "warmup"),
                 resume=False)

    queries: dict[str, float] = {}

    t0 = time.time()
    summary = run_flagship(SF_DIR, os.path.join(out_root, "flagship"),
                           resume=False)
    queries["flagship_e2e"] = time.time() - t0
    rows = summary["rows_in"]

    if os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY"):
        # scaling legs measure ONLY the headline pipeline: the rest of the
        # suite adds minutes of unrelated load per leg and injects
        # cross-leg interference into the efficiency ratio
        shutil.rmtree(out_root, ignore_errors=True)
        return _result(queries, num_cpus, rows)

    t0 = time.time()
    ds = build_parsed(SF_DIR)
    count_by(ds, ["sink", "tool", "severity_bucket"], count_col="n").to_pandas()
    queries["count_connector"] = time.time() - t0

    t0 = time.time()
    ds = build_parsed(SF_DIR)
    from opentelemetry_collector_contrib_ray.stages.aggregate import dedup_counts
    dedup_counts(ds, ["template", "severity_number", "error_code"],
                 ts_col="ts", wide=False).to_pandas()
    queries["log_dedup"] = time.time() - t0

    # OTTL statement-group executor throughput (3 statements incl. a
    # converter call + where masks over every transcript turn) — reuses
    # the gate query builder so bench and oracle measure the same plan
    t0 = time.time()
    from opentelemetry_collector_contrib_ray.pipelines.queries import (
        q_transform_statements)
    q_transform_statements(SF_DIR).count()
    queries["transform_statements"] = time.time() - t0

    # ParseKeyValue-heavy statement group: the parse adapters delegate to
    # vectorized polars/arrow kernels (3.5x the per-row scan); benched so
    # a per-row regression is visible
    t0 = time.time()
    from opentelemetry_collector_contrib_ray.pipelines.statements import (
        transform_processor)
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        transcripts_path)
    import ray.data as rd
    kv_groups = [{
        "context": "log", "error_mode": "ignore",
        "statements": [
            'set(cache["kv"], ParseKeyValue(text, "=", " "))',
            'set(kv_rt, ToKeyValueString(cache["kv"], "=", " ", true))',
        ],
    }]
    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    read_table(transcripts_path(SF_DIR),
               columns=["conv_id", "turn_idx", "text"]) \
        .map_batches(transform_processor(kv_groups, {"text": "text"}),
                     batch_format="pyarrow", batch_size=None).count()
    queries["transform_kv"] = time.time() - t0

    t0 = time.time()
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        transcripts_path)
    from opentelemetry_collector_contrib_ray.stages.recombine import (
        recombine_blocks)
    import ray.data as rd
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        read_file_blocks)
    # conversation-safe spans: read_parquet (and oversized file blocks)
    # get re-split at arbitrary rows, voiding the conversation-contained
    # contract recombine_blocks (and tail_sample pre_grouped below) rely on
    tds = read_file_blocks(transcripts_path(SF_DIR),
                           columns=["conv_id", "turn_idx", "text", "ts"],
                           group_col="conv_id", target_rows=1_000_000)
    recombine_blocks(tds).count()
    queries["recombine"] = time.time() - t0

    # tailsampling batch analogue: rate-limited plan = trace votes ->
    # windowed budget -> reduce-side semi-join (the shuffle-heavy path)
    t0 = time.time()
    from opentelemetry_collector_contrib_ray.stages.tailsample import (
        tail_sample)
    tail_sample(
        read_file_blocks(transcripts_path(SF_DIR),
                         columns=["conv_id", "turn_idx", "text", "tool",
                                  "ts"],
                         group_col="conv_id", target_rows=1_000_000),
        [{"type": "string_attribute", "key": "tool",
          "values": ["bash", "editor"]},
         {"type": "rate_limiting", "spans_per_second": 50}],
        key_col="conv_id", ts_col="ts", pre_grouped=True).count()
    queries["tail_sample"] = time.time() - t0

    # training-data dedup family over the same transcript text (doc corpus
    # proxy: one doc per turn). Skipped above 2M rows: the scaling harness
    # reuses this entry point on the 100x table, where Python-side shingling
    # of 60M docs would add ~15min per subprocess to a flagship measurement
    if rows > 2_000_000:
        shutil.rmtree(out_root, ignore_errors=True)
        return _result(queries, num_cpus, rows)

    import numpy as np
    import pyarrow as pa

    def add_id(b):
        return pa.table({
            "doc_id": pa.array(np.arange(b.num_rows, dtype=np.int64)),
            "text": b["text"]})

    from opentelemetry_collector_contrib_ray.stages.dedup import (
        exact_dedup, minhash_map_fn)
    # CPU-heavy per-row shingling wants Ray's finer default blocks for
    # load balance (measured: sized 64-block read = 3.2s vs 1.8s here);
    # prune to the only column the stage reads
    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    docs = read_table(transcripts_path(SF_DIR), columns=["text"]) \
        .map_batches(add_id, batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    docs.map_batches(minhash_map_fn(), batch_format="pyarrow",
                     batch_size=None).count()
    queries["minhash_sign"] = time.time() - t0

    docs2 = read_table(transcripts_path(SF_DIR), columns=["text"]) \
        .map_batches(add_id, batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    exact_dedup(docs2).to_pandas()
    queries["exact_dedup"] = time.time() - t0

    events = os.path.join(SF_DIR, "events.parquet")
    if os.path.exists(events):
        t0 = time.time()
        from opentelemetry_collector_contrib_ray.stages.sessionize import (
            sessionize)
        sessionize(read_table(events, columns=["user_id", "ts"]),
                   key_col="user_id", gap="30m").count()
        queries["sessionize"] = time.time() - t0

    shutil.rmtree(out_root, ignore_errors=True)
    return _result(queries, num_cpus, rows)


def run_dedup_scale(num_cpus: int = NUM_CPUS) -> dict:
    """Scale proof for the dedup merge plan (VERDICT r1 item 1/2): exact
    dedup over a ≥10M-row HIGH-DISTINCT corpus (63.5M transcript turns,
    text made unique per row — the worst case where the distinct set IS
    the corpus), plus grouped recombine at the same scale. Reports the
    merge-stage task counts parsed from ds.stats(): the old plan funneled
    every distinct digest into ONE repartition(1) block; the new plan must
    show > 32 hash-partitioned merge tasks and no single-block fan-in."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts)
    from opentelemetry_collector_contrib_ray.stages.dedup import exact_dedup
    from opentelemetry_collector_contrib_ray.stages.recombine import (
        recombine_grouped)
    from opentelemetry_collector_contrib_ray.stages.shuffle import (
        dir_size_bytes)

    tpath = ensure_transcripts("sf10")

    def uniquify(b: pa.Table) -> pa.Table:
        # distinct text per row -> distinct-key cardinality == corpus size
        suffix = pc.binary_join_element_wise(
            " #", b["conv_id"].combine_chunks()
            if isinstance(b["conv_id"], pa.ChunkedArray) else b["conv_id"],
            "/", pc.cast(b["turn_idx"], pa.string()), "")
        utext = pc.binary_join_element_wise(
            b["text"].combine_chunks()
            if isinstance(b["text"], pa.ChunkedArray) else b["text"],
            suffix, "")
        import numpy as np
        ids = np.arange(b.num_rows, dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids), "text": utext})

    def stage_stats(stats: str, name: str):
        """(tasks, max output rows per task) for a named map stage."""
        m = re.search(rf"MapBatches\({name}\)[^:]*: (\d+) tasks executed",
                      stats)
        tasks = int(m.group(1)) if m else None
        window = stats[m.start():] if m else ""
        nxt = window.find("Operator", 10)
        window = window[:nxt] if nxt > 0 else window
        r = re.search(r"Output rows per task: \d+ min, (\d+) max", window)
        max_rows = int(r.group(1)) if r else None
        return tasks, max_rows

    from opentelemetry_collector_contrib_ray.sources.tables import read_table
    ds = read_table(tpath, columns=["conv_id", "turn_idx", "text"]) \
        .map_batches(uniquify, batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    out = exact_dedup(ds).materialize()
    dedup_sec = time.time() - t0
    n_distinct = out.count()
    merge_tasks, merge_max_rows = stage_stats(out.stats(), "merge_group")

    ds2 = read_table(tpath, columns=["conv_id", "turn_idx", "text"]) \
        .map_batches(uniquify, batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    out2 = exact_dedup(ds2, digest="fast128").materialize()
    fast_sec = time.time() - t0
    n_fast = out2.count()

    t1 = time.time()
    rds = read_table(tpath,
                     columns=["conv_id", "turn_idx", "text", "ts"])
    rec = recombine_grouped(rds, size_bytes=dir_size_bytes(tpath)) \
        .materialize()
    rec_sec = time.time() - t1
    n_rec = rec.count()
    rec_tasks, rec_max_rows = stage_stats(rec.stats(), "per_partition")

    return {
        "metric": "exact dedup of 63.5M-row high-distinct corpus",
        "value": round(dedup_sec, 3),
        "unit": "sec",
        "rows": 63_500_000,
        "num_cpus": num_cpus,
        "distinct": n_distinct,
        "dedup_merge_tasks": merge_tasks,
        "dedup_merge_max_rows_per_task": merge_max_rows,
        "dedup_fast128_sec": round(fast_sec, 3),
        "dedup_fast128_distinct": n_fast,
        "recombine_sec": round(rec_sec, 3),
        "recombine_rows_out": n_rec,
        "recombine_group_tasks": rec_tasks,
        "recombine_max_rows_per_task": rec_max_rows,
    }


def run_dedup_blowup(num_cpus: int = NUM_CPUS,
                     cluster: int = 100_000,
                     background: int = 900_000) -> dict:
    """Adversarial skew proof for the near-dup family (VERDICT r2 item 1):
    MinHash+LSH over a 1M-doc corpus with a PLANTED 100k-member exact-dup
    cluster — every member lands in the same bucket in every band, so the
    uncapped plan would emit C(100k,2) ≈ 5e9 pairs from one task. With the
    default max_bucket cap the oversized buckets take the representative-
    star path: bounded pairs/task (reported from ds.stats()), the full
    cluster still connected through doc 0."""
    import re

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        minhash_lsh_pairs_scale)

    dup_text = ("the same boilerplate paragraph repeated across the whole "
                "mirror of the site over and over again")
    n_total = cluster + background

    def make_docs(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy(zero_copy_only=False)
        # background docs: 12 hash-derived words from a 50k vocab -> no
        # accidental near-dups, deterministic per id
        texts = np.empty(len(ids), object)
        in_cluster = ids < cluster
        texts[in_cluster] = dup_text
        bg = ids[~in_cluster]
        if len(bg):
            # splitmix64-style finalizer: uniform words, so background
            # docs are genuinely distinct (no accidental near-dups)
            with np.errstate(over="ignore"):
                z = (bg[:, None].astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)
                     + np.arange(12, dtype=np.uint64)[None, :])
                z ^= z >> np.uint64(30)
                z *= np.uint64(0xBF58476D1CE4E5B9)
                z ^= z >> np.uint64(27)
                z *= np.uint64(0x94D049BB133111EB)
                z ^= z >> np.uint64(31)
            h = z % np.uint64(50_000)
            texts[~in_cluster] = [" ".join("w%d" % w for w in row)
                                  for row in h]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts.tolist(), pa.string())})

    ds = rd.range(n_total).map_batches(make_docs, batch_format="pyarrow")
    t0 = time.time()
    pairs = minhash_lsh_pairs_scale(ds, threshold=0.5).materialize()
    sec = time.time() - t0
    n_pairs = pairs.count()

    # the candidate stage's emitted pairs == output rows of partition_pairs
    stats = pairs.stats()
    max_rows = None
    m = re.search(r"partition_pairs[^%]*?Output rows per task: \d+ min, "
                  r"(\d+) max", stats, re.S)
    if m:
        max_rows = int(m.group(1))

    # connectivity: every cluster member reachable from the representative
    conn = pairs.filter(expr=f"a == 0 and b < {cluster}").count()

    return {
        "metric": "minhash+lsh over 1M docs with planted 100k-dup cluster",
        "value": round(sec, 3),
        "unit": "sec",
        "rows": n_total,
        "num_cpus": num_cpus,
        "pairs_out": n_pairs,
        "cluster_members_linked_to_rep": conn,
        "max_pairs_per_candidate_task": max_rows,
        "uncapped_worst_case_pairs": cluster * (cluster - 1) // 2,
    }


def run_scaling(cpus_lo: int = 2, cpus_hi: int = 8) -> dict:
    """Same job, same input, two fresh ray.init sessions at N and 4N CPUs
    (the sandbox proxy for N- vs 4N-node clusters; default N=2). The input
    is the 100x transcript table (~60M turns) so per-stage compute, not
    session fixed cost, is measured; the input is pre-warmed into the page
    cache and sinks go to tmpfs so neither run is bound by the single VM
    disk — a resource that scales per-node on a real cluster (BASELINE.md
    records the rationale and the supplementary disk-sink numbers).

    N=2 (2 vs 8 CPUs) rather than the earlier 4 vs 16: round-4 measured
    sustained host-tenant contention that taxes high-parallelism legs
    disproportionately (the identical 16-CPU leg swung 17-53 s while the
    4-CPU leg held within 10%), which corrupts the RATIO even under
    best-of-N. Both 2 and 8 CPUs sit far below the VM's contention knee,
    so the pair measures the engine's scaling rather than the
    neighbours' load; BASELINE.md round 4 records the evidence."""
    scale_name = f"sf{_sf() * 100:g}"
    # pre-generate once so both subprocesses read the same cached input;
    # read it once so BOTH runs see a warm page cache (equal footing)
    from opentelemetry_collector_contrib_ray.sources.transcripts import (
        ensure_transcripts)
    tpath = ensure_transcripts(scale_name)
    for f in sorted(os.listdir(tpath)):
        with open(os.path.join(tpath, f), "rb") as fh:
            while fh.read(1 << 24):
                pass
    # sink scaling runs to tmpfs when available: the two runs share ONE VM
    # disk, but on a real N- vs 4N-node cluster sink bandwidth scales with
    # nodes — a single local disk is the sandbox's artificial non-scalable
    # resource, so the scaling measurement removes it (BASELINE.md)
    out_base = "/dev/shm/otelray_bench" if os.access("/dev/shm", os.W_OK) \
        else "/tmp/otelray_bench"
    def leg(n: int) -> dict:
        shutil.rmtree(out_base, ignore_errors=True)
        # pin each leg to exactly its CPU budget: an unpinned num_cpus=4
        # session on an idle 32-CPU host lets worker-internal thread pools
        # (arrow/polars/zstd) borrow the other 28 cores, inflating the
        # low leg — a real 4-core node has no spare cores to borrow
        cmd = [sys.executable, __file__, "--single", str(n)]
        # only pin when the host actually has n CPUs to give (taskset on
        # a smaller host would abort the leg); note SMT siblings can make
        # "CPUs 0..n-1" fewer physical cores than n — acceptable here
        # since both legs share the same enumeration order
        if shutil.which("taskset") and (os.cpu_count() or 0) >= n:
            cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
        proc = subprocess.run(
            cmd, capture_output=True, text=True, check=True,
            env={**os.environ, "GRAFT_SF_DIR": scale_name,
                 "GRAFT_BENCH_OUT": out_base,
                 "GRAFT_BENCH_FLAGSHIP_ONLY": "1",
                 "GRAFT_BENCH_PREWARM": "1"})
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # alternating repeats, best-of-N per leg: both legs run the identical
    # deterministic job, so on a real (quiet, per-node-isolated) cluster
    # every repeat would read the same; on this shared VM, interference
    # from the previous leg's session teardown / spill cleanup only ever
    # ADDS wall time, so the minimum is the faithful reading for each leg
    # (all samples are reported for transparency)
    # 5 repeats spread over ~10 min: host-tenant contention on this VM
    # swings in waves of minutes (measured 17-53 s for the IDENTICAL
    # 16-CPU leg across half an hour), so more widely-spaced repeats
    # raise the chance each leg catches a quiet window; the settle pause
    # also separates one leg's session teardown from the next leg's read
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "5"))
    settle = float(os.environ.get("GRAFT_SCALING_SETTLE_S", "15"))
    samples: dict[int, list[dict]] = {cpus_lo: [], cpus_hi: []}
    for i in range(repeats):
        for n in (cpus_lo, cpus_hi):
            if samples[n]:
                time.sleep(settle)
            samples[n].append(leg(n))
    shutil.rmtree(out_base, ignore_errors=True)
    lo = min(samples[cpus_lo], key=lambda r: r["value"])
    hi = min(samples[cpus_hi], key=lambda r: r["value"])
    speedup = lo["value"] / hi["value"] if hi["value"] else 0.0
    efficiency = speedup / (cpus_hi / cpus_lo)
    return {
        "metric": (f"scaling efficiency (fresh ray.init at {cpus_lo} vs "
                   f"{cpus_hi} CPUs — N vs 4N, best of "
                   f"{repeats} alternating repeats per leg)"),
        "value": round(efficiency, 3),
        "unit": "fraction",
        "sf": _sf() * 100,
        "rows": hi["rows"],
        "low": {"num_cpus": cpus_lo, "sec": lo["value"],
                "rows_per_sec": lo["rows_per_sec"],
                "samples_sec": [r["value"] for r in samples[cpus_lo]]},
        "high": {"num_cpus": cpus_hi, "sec": hi["value"],
                 "rows_per_sec": hi["rows_per_sec"],
                 "samples_sec": [r["value"] for r in samples[cpus_hi]]},
        "speedup": round(speedup, 3),
    }


def run_dedup_e2e(num_cpus: int = NUM_CPUS,
                  n_docs: int = 63_500_000) -> dict:
    """End-to-end corpus dedup at scale (VERDICT r4 item 8): synthetic
    63.5M-doc corpus of planted 3-member near-dup clusters -> exact
    n-gram Jaccard pairs -> connected components -> keep decision.
    Pair volume ~= n_docs edges (> the 5M single-task cutoff), so this
    PROVES the distributed CC path fires at scale and pins the wall
    time of the whole pairs->clusters->keep chain.

    Corpus: doc i belongs to cluster i//3; its text is 10 cluster-
    specific words + 1 member-specific word, so within-cluster Jaccard
    is 8/10 and every shared shingle has df=3 (the max_df cap stays
    cold — pair volume is structural, not capped)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        connected_components, ngram_jaccard_pairs)
    from opentelemetry_collector_contrib_ray.stages.shuffle import (
        partitioned_attach)

    def mk_docs(b: pa.Table) -> pa.Table:
        ids = b["id"].combine_chunks() if isinstance(
            b["id"], pa.ChunkedArray) else b["id"]
        cid = pc.cast(pc.divide(ids, 3), pa.string())
        member = pc.cast(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 3), 3)), pa.string())
        words = []
        for w in "abcdefghij":
            words.extend([w, cid, " "])
        text = pc.binary_join_element_wise(
            *words, "v", member, "")
        return pa.table({"doc_id": ids, "text": text})

    docs = rd.range(n_docs).map_batches(mk_docs, batch_format="pyarrow")

    t0 = time.time()
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.5,
                                max_df=256).materialize()
    pairs_sec = time.time() - t0
    n_pairs = pairs.count()

    t1 = time.time()
    comp = connected_components(pairs).materialize()
    cc_sec = time.time() - t1
    n_nodes = comp.count()

    t2 = time.time()
    only_ids = rd.range(n_docs).map_batches(
        lambda b: pa.table({"doc_id": b["id"]}), batch_format="pyarrow")
    attached = partitioned_attach(
        only_ids, {"doc_id": pa.int64()}, comp, key_col="doc_id",
        right_key="node", right_val="component", out_name="component")

    def keep(b: pa.Table) -> pa.Table:
        c = b["component"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        ok = pc.fill_null(pc.equal(c, b["doc_id"]), True)
        return b.filter(ok).select(["doc_id"])

    kept = attached.map_batches(keep, batch_format="pyarrow",
                                batch_size=None)
    n_kept = kept.count()
    keep_sec = time.time() - t2

    expected_clusters = -(-n_docs // 3)
    return {
        "metric": "corpus dedup e2e (pairs->CC->keep) wall time",
        "value": round(pairs_sec + cc_sec + keep_sec, 3),
        "unit": "sec",
        "rows": n_docs,
        "num_cpus": num_cpus,
        "pairs_sec": round(pairs_sec, 3),
        "pairs": n_pairs,
        "cc_sec": round(cc_sec, 3),
        "cc_nodes": n_nodes,
        "cc_distributed_path": n_pairs > 5_000_000,
        "keep_sec": round(keep_sec, 3),
        "kept": n_kept,
        "kept_expected": expected_clusters,
        "keep_correct": n_kept == expected_clusters,
    }


def run_cc_scale(num_cpus: int = NUM_CPUS, clusters: int = 5_000,
                 cluster_size: int = 10, chain_len: int = 4,
                 chains: int = 20) -> dict:
    """End-to-end correctness probe for the DISTRIBUTED
    connected-components plan (the local single-task path is bypassed
    via n_parts): ~45k synthetic edges — 5k star clusters of 10 nodes
    (the near-dup shape) plus short chains — validated by exact
    component count and hub-resolution checks via aggregates only
    (no driver materialization of the label table).

    Sized for the plan's mechanics, not throughput: each round is a
    fixed stack of Ray all-to-all ops whose latency dominates any
    single-VM graph size (measured ~60 s/round at 450k edges, with
    Ray's sort-shuffle warning about driver-side consolidation). At
    real scale the practical path is the local cutoff (one vectorized
    task comfortably handles 5M edges ~ a 50M-doc corpus at 10% dup
    rate); graphs beyond that amortize the per-round cost across
    cluster nodes, which a single VM cannot evidence."""
    import ray
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    from opentelemetry_collector_contrib_ray.stages.dedup import (
        connected_components)

    star_edges = clusters * (cluster_size - 1)

    def make_edges(batch) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # edge j of the star block: cluster c = j // (size-1), hub c*size,
        # spoke = hub + 1 + (j % (size-1))
        star = ids[ids < star_edges]
        c = star // (cluster_size - 1)
        hub = c * cluster_size
        spoke = hub + 1 + (star % (cluster_size - 1))
        # chain edges live above the star id space
        ch = ids[ids >= star_edges] - star_edges
        base = clusters * cluster_size
        cidx, pos = ch // (chain_len - 1), ch % (chain_len - 1)
        a0 = base + cidx * chain_len + pos
        return pa.table({
            "a": pa.array(np.concatenate([hub, a0]), pa.int64()),
            "b": pa.array(np.concatenate([spoke, a0 + 1]), pa.int64())})

    n_edges = star_edges + chains * (chain_len - 1)
    pairs = rd.range(n_edges, override_num_blocks=num_cpus * 4) \
        .map_batches(make_edges, batch_format="pyarrow", batch_size=None)
    t0 = time.time()
    comp = connected_components(pairs, n_parts=num_cpus * 2,
                                max_iter=16).materialize()
    wall = time.time() - t0
    n_nodes = comp.count()
    n_components = comp.groupby("component").count().count()

    def bad_hubs(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        lab = batch["component"].to_numpy(zero_copy_only=False)
        is_hub = (node % cluster_size == 0) & \
            (node < clusters * cluster_size)
        return pa.table({"bad": pa.array(
            [int((is_hub & (lab != node)).sum())], pa.int64())})

    hubs_ok = comp.map_batches(bad_hubs, batch_format="pyarrow",
                               batch_size=None).sum("bad") == 0
    return {
        "metric": "distributed connected-components wall time",
        "value": round(wall, 3), "unit": "sec",
        "edges": n_edges, "nodes": n_nodes,
        "components": n_components,
        "components_expected": clusters + chains,
        "stars_resolved": bool(hubs_ok),
        "num_cpus": num_cpus,
    }


def main() -> None:
    import ray

    if "--single" in sys.argv:
        n = int(sys.argv[sys.argv.index("--single") + 1])
        print(json.dumps(run_once(n)))
    elif "--dedup-scale" in sys.argv:
        print(json.dumps(run_dedup_scale()))
    elif "--dedup-blowup" in sys.argv:
        print(json.dumps(run_dedup_blowup()))
    elif "--cc-scale" in sys.argv:
        print(json.dumps(run_cc_scale()))
    elif "--dedup-e2e" in sys.argv:
        i = sys.argv.index("--dedup-e2e")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 \
            and sys.argv[i + 1].isdigit() else 63_500_000
        print(json.dumps(run_dedup_e2e(n_docs=n)))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once(NUM_CPUS)))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
