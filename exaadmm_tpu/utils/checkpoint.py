"""Checkpoint / resume for solver state.

The reference has no serialization — warm starts are in-memory only
(SURVEY.md §5). Here any solution pytree (Solution, SolutionMpacopf,
SolutionQpsub, ...) round-trips through a single ``.npz`` file; loading
restores into a structurally identical template (e.g. from
``init_solution``), so a long solve can resume across processes:

    save_solution("ckpt.npz", sol, meta={"outer": info.outer})
    sol, meta = load_solution("ckpt.npz", init_solution(model, rho_pq, rho_va))

For sharded multi-chip state, :func:`save_solution_orbax` /
:func:`load_solution_orbax` delegate to orbax (async-capable, writes
per-shard without gathering to one host; restores with the template's
shardings applied).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    out = []
    for p in path:
        if hasattr(p, "name"):
            out.append(str(p.name))
        elif hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "idx"):
            out.append(str(p.idx))
        else:
            out.append(str(p))
    return "/".join(out)


def save_solution(path: str, sol, meta: dict | None = None) -> None:
    leaves = jax.tree_util.tree_flatten_with_path(sol)[0]
    arrays = {f"leaf{i}__{_path_str(p)}": np.asarray(v)
              for i, (p, v) in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_solution(path: str, template):
    """Restore a pytree saved by :func:`save_solution` into ``template``'s
    structure (shapes/dtypes taken from the template; mismatches raise)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        keys = sorted((k for k in data.files if k != "__meta__"),
                      key=lambda k: int(k.split("__", 1)[0][4:]))
        stored = [data[k] for k in keys]

    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(stored) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(stored)} leaves, template has {len(t_leaves)}")
    out = []
    for s, t in zip(stored, t_leaves):
        t = jnp.asarray(t)
        if s.shape != t.shape:
            raise ValueError(f"leaf shape mismatch: {s.shape} vs {t.shape}")
        out.append(jnp.asarray(s, t.dtype))
    return jax.tree_util.tree_unflatten(treedef, out), meta


# --- orbax backend (multi-host / sharded state) -----------------------------

def save_solution_orbax(path: str, sol, meta: dict | None = None) -> None:
    """Save a solution pytree with orbax (directory checkpoint).

    Unlike the npz path this never gathers to one host: each process writes
    its own shards, so it scales to multi-host meshes. ``meta`` (small JSON
    scalars) is stored alongside.
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.Checkpointer(
        ocp.CompositeCheckpointHandler()
    ) as ckptr:
        ckptr.save(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(sol),
                meta=ocp.args.JsonSave(meta or {}),
            ),
            force=True,
        )


def load_solution_orbax(path: str, template):
    """Restore an orbax checkpoint into ``template``'s structure.

    The template's leaves supply dtypes and (when they are jax.Arrays with a
    sharding) the target shardings, so a checkpoint written from an 8-chip
    mesh restores directly into another mesh's layout.
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.Checkpointer(
        ocp.CompositeCheckpointHandler()
    ) as ckptr:
        out = ckptr.restore(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
    return out["state"], dict(out["meta"])
