"""Multi-host data-parallel rehearsal — real multi-PROCESS rendezvous on one
machine.

The reference only ever launches multi-GPU single-host (`deepspeed
--include=localhost:...`, /root/reference/start.sh); its multi-node path
(env/SLURM NCCL init, dist_utils.py:57-93) ships untested. Our multi-host
path is `jax.distributed.initialize` (common/dist.py::init_distributed_mode)
— and this tool actually exercises it without a pod: it spawns N OS
processes, each owning 4 virtual CPU devices, rendezvouses them through the
real coordinator service (gloo CPU collectives stand in for DCN), builds the
global (data x fsdp x model) mesh with `data` spanning the process boundary
— exactly how DCN slices map on a real multi-slice TPU job — and runs the
sharded LM train step with per-process batch shards fed through
`jax.make_array_from_process_local_data` (the multi-host input path the
runner uses on a pod).

Checks:
  * rendezvous: process_count == N, 4N global devices visible everywhere
  * a cross-process psum sums contributions from every process
  * two optimizer steps of the REAL jitted train step (runners/train_step)
    complete with finite, byte-identical loss on every process
  * the loss trajectory matches a single-process run on the same global
    batch (the data-parallel gradient all-reduce crosses the process
    boundary correctly)

Run: python tools/multihost_rehearsal.py [--procs 2]
Exercised by tests/test_multihost.py (slow tier).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCAL_DEVICES = 4


def child(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from spider_tpu.common import dist

    dist.init_distributed_mode(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_processes
    n_global = num_processes * LOCAL_DEVICES
    assert len(jax.devices()) == n_global
    assert len(jax.local_devices()) == LOCAL_DEVICES

    # --- cross-process psum sanity: every process contributes its rank+1
    mesh = dist.make_mesh(data=num_processes, fsdp=1,
                          model=LOCAL_DEVICES)
    sh = NamedSharding(mesh, P("data"))
    local = np.full((LOCAL_DEVICES,), float(process_id + 1), np.float32)
    g = jax.make_array_from_process_local_data(sh, local, (n_global,))
    total = float(jax.jit(jnp.sum,
                          out_shardings=NamedSharding(mesh, P()))(g))
    expect = LOCAL_DEVICES * sum(range(1, num_processes + 1))
    assert total == expect, (total, expect)

    # --- the real sharded train step, data axis across the process boundary
    from spider_tpu.models import llama as L
    from spider_tpu.runners import train_step as TS

    mesh = dist.make_mesh(data=num_processes, fsdp=2,
                          model=LOCAL_DEVICES // 2)
    cfg = L.llama_tiny(vocab_size=256)
    model = L.LlamaForCausalLM(cfg)
    tx = TS.build_optimizer(1e-3, grad_accum_steps=1)
    B_global, T = 2 * num_processes, 16
    ids_example = jnp.ones((B_global, T), jnp.int32)
    state = TS.init_sharded_state(model, tx, mesh, ids_example)
    step = TS.make_jitted_train_step(model, tx, mesh, state)

    batch_sh = NamedSharding(mesh, P(("data", "fsdp"), None))
    losses = []
    for i in range(2):
        # the full global batch is derived from a shared seed; each process
        # donates only its own data-axis rows (rows are laid out data-major)
        rng = np.random.default_rng(1234 + i)
        global_ids = rng.integers(0, 256, (B_global, T)).astype(np.int32)
        rows = slice(2 * process_id, 2 * (process_id + 1))
        batch = {
            k: jax.make_array_from_process_local_data(
                batch_sh, v[rows], (B_global, T))
            for k, v in (("input_ids", global_ids),
                         ("labels", global_ids))
        }
        with mesh:
            state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])

    print(json.dumps({"process_id": process_id,
                      "process_count": jax.process_count(),
                      "global_devices": n_global,
                      "psum_total": total,
                      "losses": losses}), flush=True)


def single_process_reference(num_processes: int):
    """Same two steps on one process (4N virtual devices) for comparison."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", num_processes * LOCAL_DEVICES)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spider_tpu.common import dist
    from spider_tpu.models import llama as L
    from spider_tpu.runners import train_step as TS

    mesh = dist.make_mesh(data=num_processes, fsdp=2,
                          model=LOCAL_DEVICES // 2)
    cfg = L.llama_tiny(vocab_size=256)
    model = L.LlamaForCausalLM(cfg)
    tx = TS.build_optimizer(1e-3, grad_accum_steps=1)
    B_global, T = 2 * num_processes, 16
    state = TS.init_sharded_state(model, tx, mesh,
                                  jnp.ones((B_global, T), jnp.int32))
    step = TS.make_jitted_train_step(model, tx, mesh, state)
    losses = []
    for i in range(2):
        rng = np.random.default_rng(1234 + i)
        ids = jnp.asarray(rng.integers(0, 256, (B_global, T)), jnp.int32)
        with mesh:
            state, metrics = step(state, {"input_ids": ids, "labels": ids})
        losses.append(float(metrics["loss"]))
    print(json.dumps({"reference_losses": losses}), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--port", type=int, default=12765)
    ap.add_argument("--child", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--reference", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child is not None:
        child(args.child, args.procs, args.port)
        return 0
    if args.reference:
        single_process_reference(args.procs)
        return 0

    env = dict(os.environ, PYTHONPATH=REPO)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--procs",
         str(args.procs), "--port", str(args.port), "--child", str(i)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(args.procs)]
    outs = []
    ok = True
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        ok &= p.returncode == 0
    if not ok:
        for o in outs:
            print(o)
        print("multihost_rehearsal: FAILED (child rc != 0)")
        return 1

    results = [json.loads(line) for o in outs for line in o.splitlines()
               if line.startswith("{")]
    losses = {tuple(r["losses"]) for r in results}
    assert len(results) == args.procs, results
    assert len(losses) == 1, f"loss mismatch across processes: {losses}"

    ref = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--procs",
         str(args.procs), "--reference"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    ref_losses = [json.loads(line)["reference_losses"]
                  for line in ref.stdout.splitlines()
                  if line.startswith("{")][0]
    got = list(losses)[0]
    import math
    assert all(math.isclose(a, b, rel_tol=1e-5)
               for a, b in zip(got, ref_losses)), (got, ref_losses)
    print(json.dumps({
        "ok": True, "processes": args.procs,
        "global_devices": args.procs * LOCAL_DEVICES,
        "losses": got, "single_process_reference": ref_losses,
        "note": "data axis spans the process boundary (DCN analogue); "
                "gradient all-reduce crosses processes via gloo",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
