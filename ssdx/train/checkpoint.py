"""Checkpoint save/load with the reference's tag policy and resume semantics.

Replaces ``save_checkpoint``/``load_checkpoint``/``_atomic_save``
(SSD_trainer.py:696-802).  Same logical schema: epoch, model state (params +
batch_stats), optimizer state, best_metric, RNG states (python, numpy, and the
JAX PRNG key — the analog of the reference's torch/cuda RNG states,
SSD_trainer.py:740-745), and the loss-history dict.  Same tag policy
("last", "best", "epoch_NNN") and atomic tmp-file + rename write
(:696-700); ``load_checkpoint`` returns ``start_epoch = epoch + 1`` (:798).

Format: a single ``.ckpt`` file — pickle of a numpy-converted pytree (the
same class of container format as ``torch.save``).  A ``save_params`` /
``load_params`` pair provides the weights-only export the serving app needs
(the reference app loads a bare state_dict, ssd_demo_app.py:34).

Epoch convention (format 2): ``epoch`` is the 0-based index of the LAST
COMPLETED epoch and ``load_checkpoint`` returns ``start_epoch = epoch + 1``.
Format-1 checkpoints (round-1 ssdx, which stored a 1-based completed count)
would resume one epoch short; none were ever published, so no migration
shim is carried — the ``format`` key exists to make any future change
detectable at load time.

``opt_state`` layout: the optimizer is wrapped in ``optax.flatten`` (see
``ssdx/train/schedule.py``), so momentum is stored as ONE flat vector.
Checkpoints written before that change hold a per-leaf momentum pytree and
cannot resume optimizer state (params/batch_stats still load via
``load_params``); none were published, so no migration shim is carried.

Multi-host: when ``jax.process_count() > 1`` the pickle format is wrong
(every process would serialize the full state and race on one file), so
``save_checkpoint`` auto-dispatches to the per-process-sharded orbax format
(``ssdx.train.sharded_checkpoint``), and ``load_checkpoint`` dispatches on
the on-disk shape (directory = sharded, file = pickle).  Callers — the
training loop, resume, eval CLIs — are agnostic to the format.
"""
from __future__ import annotations

import pickle
import random
from pathlib import Path
from typing import Any

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "save_params",
    "load_params",
]


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _atomic_write(payload: bytes, path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(payload)
    if path.is_dir():
        # The tag currently holds a sharded (directory-format) checkpoint —
        # e.g. a multi-host run resumed on a single host.  rename() cannot
        # replace a non-empty directory, so drop it first; the format switch
        # trades away atomicity for this one transition only.
        import shutil

        shutil.rmtree(path)
    tmp.replace(path)  # atomic on the same filesystem


def save_checkpoint(
    epoch: int,
    state,  # TrainState
    loss_dict: dict | None,
    rng_key: jax.Array | None = None,
    best_metric: float | None = None,
    outdir: str | Path = "checkpoints",
    tag: str = "last",
) -> Path:
    """Write ``{outdir}/{tag}.ckpt`` atomically; returns the path."""
    if jax.process_count() > 1:
        from .sharded_checkpoint import save_checkpoint_sharded

        return save_checkpoint_sharded(
            epoch, state, loss_dict, rng_key, best_metric, outdir, tag
        )
    ckpt = {
        "format": 2,  # epoch = 0-based last-completed index (module docstring)
        "epoch": int(epoch),
        "step": int(state.step),
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _to_numpy(state.opt_state),
        "best_metric": best_metric,
        "rng_state": {
            "python": random.getstate(),
            "numpy": np.random.get_state(),
            "jax_key": None if rng_key is None else np.asarray(jax.random.key_data(rng_key)),
        },
        "loss_dict": loss_dict,
    }
    path = Path(outdir) / f"{tag}.ckpt"
    _atomic_write(pickle.dumps(ckpt, protocol=pickle.HIGHEST_PROTOCOL), path)
    return path


def load_checkpoint(path: str | Path, state, restore_rng: bool = True):
    """Restore a checkpoint into ``state`` (a TrainState template with the
    right tree structure).

    Returns ``(state, start_epoch, best_metric, loss_dict, rng_key)``;
    ``rng_key`` is None if the checkpoint carries no JAX key.
    """
    if Path(path).is_dir():
        from .sharded_checkpoint import load_checkpoint_sharded

        return load_checkpoint_sharded(path, state, restore_rng=restore_rng)
    with open(path, "rb") as f:
        ckpt = pickle.load(f)

    def _restore(template, saved):
        leaves, treedef = jax.tree.flatten(template)
        saved_leaves = jax.tree.leaves(saved)
        if len(leaves) != len(saved_leaves):
            raise ValueError(
                f"checkpoint tree mismatch: {len(saved_leaves)} saved leaves "
                f"vs {len(leaves)} expected"
            )
        return jax.tree.unflatten(treedef, saved_leaves)

    state = state.replace(
        step=np.asarray(ckpt["step"], np.int32),
        params=_restore(state.params, ckpt["params"]),
        batch_stats=_restore(state.batch_stats, ckpt["batch_stats"]),
        opt_state=_restore(state.opt_state, ckpt["opt_state"]),
    )

    rng_key = None
    rng = ckpt.get("rng_state") or {}
    if restore_rng and rng:
        if rng.get("python") is not None:
            random.setstate(rng["python"])
        if rng.get("numpy") is not None:
            np.random.set_state(rng["numpy"])
        if rng.get("jax_key") is not None:
            rng_key = jax.random.wrap_key_data(np.asarray(rng["jax_key"]))

    start_epoch = int(ckpt["epoch"]) + 1
    return state, start_epoch, ckpt.get("best_metric"), ckpt.get("loss_dict"), rng_key


def save_params(params, batch_stats, path: str | Path) -> Path:
    """Weights-only export for serving (analog of the app's bare ``.pth``
    state_dict, ssd_demo_app.py:32-36)."""
    path = Path(path)
    payload = pickle.dumps(
        {"params": _to_numpy(params), "batch_stats": _to_numpy(batch_stats)},
        protocol=pickle.HIGHEST_PROTOCOL,
    )
    _atomic_write(payload, path)
    return path


def save_params_npz(params, batch_stats, path: str | Path) -> Path:
    """Compressed float16 weights bundle (.npz) — the shippable demo-artifact
    format (~45 MB vs 93 MB pickle for the full SSD300).  Keys are
    slash-joined tree paths; load_params rebuilds the nested dict and casts
    back to float32."""
    path = Path(path)
    flat: dict[str, np.ndarray] = {}

    def walk(t, pre):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, f"{pre}/{k}")
        else:
            flat[pre] = np.asarray(t).astype(np.float16)

    walk(_to_numpy(params), "params")
    walk(_to_numpy(batch_stats), "batch_stats")
    import io

    buf = io.BytesIO()
    np.savez_compressed(buf, **flat)
    _atomic_write(buf.getvalue(), path)
    return path


def load_params(path: str | Path) -> dict:
    """Load a weights-only export (pickle or .npz bundle);
    returns {'params', 'batch_stats'}."""
    path = Path(path)
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"PK":  # zip container = np.savez bundle (suffix-agnostic)
        out: dict = {}
        with np.load(path) as z:
            for key in z.files:
                parts = key.split("/")
                node = out
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = z[key].astype(np.float32)
        return out
    with open(path, "rb") as f:
        return pickle.load(f)
