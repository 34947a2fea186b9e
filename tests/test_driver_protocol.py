"""Replay of the driver's correctness-gate protocol (VERDICT r4 item 1c).

CORRECTNESS_r03/r04 came back `{}` even though the local gate replica passed
54/54 — so the failure mode lives in the *protocol*, not the queries. This
test reproduces the driver's exact shape in a fresh subprocess:

  - the driver calls ``ray.init(...)`` itself BEFORE importing
    ``__ray_entry__`` (so the module must not init/shutdown Ray);
  - it runs ``entry()`` plus every ``queries()[name](sf_dir)`` in one
    process, converting each result to pandas;
  - its pipes are NOT drained until the child exits — an undrained 64 KiB
    stderr/stdout pipe wedges the child forever (the r3 failure class).

The child writes a JSON artifact (one row per query) and is waited on
WITHOUT reading its pipes first, so any output-volume regression >64 KiB
deadlocks and fails the test at the timeout instead of landing as an empty
official artifact next round. sf0.001 keeps the replay inside the suite
budget; the protocol (init order, pipe discipline, artifact shape) is
identical at sf0.01.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False)
sys.path.insert(0, {repo!r})
import __ray_entry__ as e

res = e.entry()
rows = res.count() if isinstance(res, ray.data.Dataset) else len(res)
assert rows >= 0

art = {{}}
qs, oqs = e.queries(), e.oracle_sql()
for name, fn in qs.items():
    out = fn({sf_dir!r})
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    art[name] = {{"rows": int(len(df)), "has_oracle": name in oqs}}
with open({artifact!r}, "w") as f:
    json.dump(art, f)
ray.shutdown()
"""


def test_driver_protocol_replay(tmp_path):
    artifact = str(tmp_path / "correctness_replay.json")
    script = CHILD.format(repo=REPO, sf_dir="/root/testdata/sf0.001",
                          artifact=artifact)
    p = subprocess.Popen([sys.executable, "-c", script],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         cwd=REPO)
    try:
        # the driver-shaped wait: pipes stay undrained until exit. If the
        # child emits >64 KiB it blocks on a full pipe and this times out.
        rc = p.wait(timeout=420)
    except subprocess.TimeoutExpired:
        p.kill()
        out, err = p.communicate()
        raise AssertionError(
            "child wedged with undrained pipes (output-volume regression); "
            f"stderr tail: {err[-2000:]!r}")
    out, err = p.communicate()
    assert rc == 0, f"child failed rc={rc}: {err[-4000:].decode(errors='replace')}"

    # output budget: far below the 64 KiB pipe capacity, with headroom
    assert len(out) + len(err) < 8192, (len(out), len(err), err[:2000])

    with open(artifact) as f:
        art = json.load(f)
    assert len(art) >= 61, sorted(art)
    assert all(v["rows"] >= 0 for v in art.values())
    # every SQL-oracle query name must resolve (drift here = silent gate gap)
    assert sum(v["has_oracle"] for v in art.values()) >= 54
