"""Checkpoint / resume.

The reference persists state two ways: ``torch.save``/``torch.load`` of whole
agent modules through a temp file (cloning, tournament.py:54-60) and
``pickle.dump((agents, tournament))`` session snapshots from the notebook
(SURVEY.md §5).  Here both collapse into one mechanism:

* agents are picklable by construction (transient jitted callables drop and
  rebuild on load; parameters and optimizer moments are plain arrays);
* :func:`save_checkpoint` / :func:`load_checkpoint` write any pytree of
  picklable objects (a tournament, a dict of agents, raw param trees)
  atomically (tmp file + rename);
* :func:`save_params` / :func:`load_params` store bare parameter pytrees in a
  portable flat-``npz`` format (no pickle on the load path) for exchanging
  weights between training runs;
* :func:`save_params_orbax` / :func:`load_params_orbax` store the same
  pytrees through Orbax (tensorstore-backed, the standard JAX checkpoint
  format for multi-host runs — every process writes its addressable shards).
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, payload: Any) -> None:
    """Atomically pickle ``payload`` to ``path``."""
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_params(path: str, params: Any) -> None:
    """Save a parameter pytree as flat npz (keys = tree paths)."""
    flat = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(_path_str(k) for k in key_path)
        flat[name] = np.asarray(leaf)
    directory = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(directory, exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **flat)


def load_params(path: str, like: Any) -> Any:
    """Load an npz written by :func:`save_params` into the structure of ``like``."""
    with np.load(path) as data:
        leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(like)
        loaded = []
        for key_path, leaf in leaves_with_path:
            name = "/".join(_path_str(k) for k in key_path)
            arr = data[name]
            assert arr.shape == np.shape(leaf), (name, arr.shape, np.shape(leaf))
            loaded.append(arr)
    return jax.tree_util.tree_unflatten(treedef, loaded)


def save_params_orbax(path: str, params: Any) -> None:
    """Save a parameter pytree as an Orbax (tensorstore) checkpoint directory.

    Overwrites ``path`` if it exists.  Unlike the npz format this scales to
    sharded multi-host params: under ``jax.distributed`` each process writes
    only its addressable shards.  Overwrite is delegated to Orbax
    (``force=True``), which deletes on the primary process and barriers —
    a manual exists+rmtree here would race across processes.
    """
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_params_orbax(path: str, like: Any) -> Any:
    """Restore an Orbax checkpoint into the structure of ``like``.

    Leaves come back as host numpy arrays (like :func:`load_params`); restoring
    to explicit ``np.ndarray`` avoids needing device shardings at load time, so
    the same checkpoint restores on any backend (or none).
    """
    import orbax.checkpoint as ocp

    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), like
    )
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path), item=like, restore_args=restore_args
        )
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(like)):
        assert np.shape(a) == np.shape(b), (np.shape(a), np.shape(b))
    return restored


def _path_str(entry) -> str:
    for attr in ("key", "idx", "name"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)
