"""Shared CLI flags for multi-chip meshes.

The reference's user-facing split controls (--split-mode row / --tensor-split,
llama.h:222-227) map to a jax Mesh here: -tp shards weights + KV heads,
-sp shards KV cells (sequence/context parallelism). Multi-host runs
additionally call jax.distributed.initialize (--dist-*) so the same mesh
spans processes over DCN.
"""

from __future__ import annotations


def add_mesh_args(ap) -> None:
    ap.add_argument("-tp", "--tensor-parallel", type=int, default=1,
                    help="shard weights/KV-heads over N chips (GSPMD TP)")
    ap.add_argument("-sp", "--seq-parallel", type=int, default=1,
                    help="shard KV cache cells over N chips (context parallel)")
    ap.add_argument("--dist-coordinator", default=None,
                    help="host:port of process 0 (multi-host jax.distributed)")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    ap.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                    help="force the jax platform (jax.config, reliable where "
                         "env overrides are not)")
    ap.add_argument("--n-virtual-devices", type=int, default=None,
                    help="with --platform cpu: virtual host device count "
                         "(test TP/SP meshes without TPU hardware)")


def mesh_from_args(args):
    """Build the Mesh (or None for single-chip). Initializes jax.distributed
    first when --dist-coordinator is given — the multi-host entry point that
    replaces the reference's rpc-server (SURVEY.md §2.5 multi-node row)."""
    import os

    import jax

    if getattr(args, "n_virtual_devices", None):
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.n_virtual_devices}").strip()
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)

    if args.dist_coordinator:
        jax.distributed.initialize(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id,
        )
    n_tp = getattr(args, "tensor_parallel", 1) or 1
    n_sp = getattr(args, "seq_parallel", 1) or 1
    if n_tp * n_sp <= 1:
        return None
    from ..parallel.sharding import make_mesh

    n_dev = len(jax.devices())
    if n_tp * n_sp > n_dev:
        raise SystemExit(
            f"mesh tp={n_tp} x sp={n_sp} needs {n_tp * n_sp} devices, "
            f"have {n_dev}")
    return make_mesh(n_tp=n_tp, n_sp=n_sp)
