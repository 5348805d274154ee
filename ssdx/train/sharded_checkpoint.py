"""Multi-host (per-process sharded) checkpointing via orbax.

The single-process format (``ssdx.train.checkpoint``) pickles the fully
replicated state from one host — fine for a single-host v5e-8 slice, wrong
for multi-host: every process would serialize the whole (possibly
DCN-sharded) state and race on the same file.  This module provides the
same logical schema (epoch, params, batch_stats, opt_state, best_metric,
RNG states, loss history — the analog of the reference's
``save_checkpoint``/``load_checkpoint``, SSD_trainer.py:696-802) with
orbax/tensorstore array storage, where **each process writes only the array
shards its addressable devices own** and restore reassembles global
``jax.Array``s against the template state's shardings.

Layout on disk (a *directory* per tag, vs the pickle's single file):

    {outdir}/{tag}.ckpt/                 orbax OCDBT tree (step/params/
                                         batch_stats/opt_state shards)
    {outdir}/{tag}.ckpt/host_meta_p{K}.pkl
                                         per-process host state: python +
                                         numpy RNG (process-local by design;
                                         the input pipeline is seeded
                                         per-process), and on p0 also epoch,
                                         best_metric, loss_dict, jax key

Crash-safety / tag-overwrite protocol (orbax finalizes a fresh directory
atomically but cannot atomically *replace* an existing one):

    1. all processes save arrays into ``{tag}.ckpt.staging`` (orbax
       tmp-dir + rename; stale staging removed first),
    2. each process drops its ``host_meta_p{K}.pkl`` into the finalized
       staging dir (extra files are ignored by orbax restore),
    3. after a cross-process barrier, process 0 swaps directories:
       ``{tag}.ckpt`` -> ``{tag}.ckpt.old``, staging -> ``{tag}.ckpt``,
       delete ``.old``.  A crash between the renames leaves ``.old`` (and/or
       the finalized staging) on disk for manual recovery; the window is two
       metadata renames, the same order of exposure as the reference's
       tmp-file ``Path.replace`` (SSD_trainer.py:696-700).

``save_checkpoint``/``load_checkpoint`` in ``ssdx.train.checkpoint``
auto-dispatch here when ``jax.process_count() > 1`` (save) or when the path
is a directory (load), so the training loop and CLIs are agnostic.
"""
from __future__ import annotations

import pickle
import random
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint_sharded", "load_checkpoint_sharded"]


def _barrier(name: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint_sharded(
    epoch: int,
    state,  # TrainState (leaves may be sharded jax.Arrays)
    loss_dict: dict | None,
    rng_key: jax.Array | None = None,
    best_metric: float | None = None,
    outdir: str | Path = "checkpoints",
    tag: str = "last",
) -> Path:
    """Write ``{outdir}/{tag}.ckpt/`` (directory) per the module protocol."""
    final = Path(outdir).resolve() / f"{tag}.ckpt"
    staging = final.with_suffix(".ckpt.staging")
    old = final.with_suffix(".ckpt.old")
    pid = jax.process_index()

    if pid == 0:
        final.parent.mkdir(parents=True, exist_ok=True)
        for stale in (staging, old):
            if stale.exists():
                shutil.rmtree(stale)
    _barrier(f"ssdx_ckpt_pre_{tag}")

    arrays = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr = _checkpointer()
    ckptr.save(staging, arrays)
    ckptr.wait_until_finished()
    _barrier(f"ssdx_ckpt_saved_{tag}")

    meta: dict[str, Any] = {
        "rng_state": {
            "python": random.getstate(),
            "numpy": np.random.get_state(),
        },
    }
    if pid == 0:
        meta.update(
            epoch=int(epoch),
            best_metric=best_metric,
            loss_dict=loss_dict,
            jax_key=None
            if rng_key is None
            else np.asarray(jax.random.key_data(rng_key)),
        )
    tmp = staging / f"host_meta_p{pid}.pkl.tmp"
    tmp.write_bytes(pickle.dumps(meta, protocol=pickle.HIGHEST_PROTOCOL))
    tmp.replace(staging / f"host_meta_p{pid}.pkl")
    _barrier(f"ssdx_ckpt_meta_{tag}")

    if pid == 0:
        if final.exists():
            final.replace(old)
        staging.replace(final)
        if old.exists():
            shutil.rmtree(old)
    _barrier(f"ssdx_ckpt_swap_{tag}")
    return final


def load_checkpoint_sharded(path: str | Path, state, restore_rng: bool = True):
    """Restore a sharded checkpoint directory into ``state`` (template with
    the target tree structure AND shardings — each leaf's ``.sharding``
    says how the restored global array is laid out, so every process reads
    only the byte ranges its devices need).

    Returns ``(state, start_epoch, best_metric, loss_dict, rng_key)`` — the
    same contract as the single-process ``load_checkpoint``.
    """
    path = Path(path).resolve()
    pid = jax.process_index()

    def _abstract(leaf):
        x = jax.numpy.asarray(leaf) if not hasattr(leaf, "sharding") else leaf
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)

    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    abstract = jax.tree.map(_abstract, template)
    got = _checkpointer().restore(path, abstract)
    state = state.replace(
        step=got["step"],
        params=got["params"],
        batch_stats=got["batch_stats"],
        opt_state=got["opt_state"],
    )

    meta0 = pickle.loads((path / "host_meta_p0.pkl").read_bytes())
    mine = path / f"host_meta_p{pid}.pkl"
    meta_local = pickle.loads(mine.read_bytes()) if mine.exists() else meta0

    rng_key = None
    if restore_rng:
        rng = meta_local.get("rng_state") or {}
        if rng.get("python") is not None:
            random.setstate(rng["python"])
        if rng.get("numpy") is not None:
            np.random.set_state(rng["numpy"])
        if meta0.get("jax_key") is not None:
            rng_key = jax.random.wrap_key_data(np.asarray(meta0["jax_key"]))

    start_epoch = int(meta0["epoch"]) + 1
    return state, start_epoch, meta0.get("best_metric"), meta0.get("loss_dict"), rng_key
