"""Unified Orbax checkpointing for all three trainables.

The reference has three disjoint formats (SURVEY.md §5): Lightning ckpts for
the TTE (`train.py:144-151`), raw torch.save g_/do_ dicts for the vocoder
(`utils/vocoder/train.py:182-191`), and a hand-rolled dict for the aligner
(`utils/aligner/trainer.py:77-88`) — and the vocoder's own main() deletes its
checkpoint dir on startup, defeating resume. Here: one sharded-aware Orbax
layer with step-numbered directories, keep-all retention (reference
save_top_k=-1), and a `latest_step`/restore API used by every trainer.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int | None = None):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metadata: dict | None = None,
             wait: bool = False) -> None:
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **({"metadata": ocp.args.JsonSave(metadata)} if metadata else {}),
        )
        self._mgr.save(step, args=args)
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, template: Any = None,
                with_metadata: bool = False) -> Any:
        """Restore state at `step` (latest by default). With
        with_metadata=True returns (state, metadata_dict_or_None) — the
        metadata the trainer saved alongside (step / val losses; the
        reference embeds these in the Lightning ckpt name + file,
        train.py:144-151,62)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        parts = {"state": (ocp.args.StandardRestore(template)
                           if template is not None
                           else ocp.args.StandardRestore())}
        has_meta = False
        if with_metadata:
            # items live at <dir>/<step>/<item_name>; probing disk avoids
            # depending on item_metadata API details across orbax versions
            has_meta = (self.directory / str(step) / "metadata").exists()
            if has_meta:
                parts["metadata"] = ocp.args.JsonRestore()
        out = self._mgr.restore(step, args=ocp.args.Composite(**parts))
        if with_metadata:
            return out["state"], (out["metadata"] if has_meta else None)
        return out["state"]

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str | Path, params: Any) -> None:
    """One-shot param save (e.g. folded inference params)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str | Path, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), template)


def save_config_json(directory: str | Path, cfg_json: str) -> None:
    """Keep the config next to the checkpoints (the reference's build_env
    copies config.json likewise, utils/vocoder/utils.py:70-74)."""
    Path(directory).mkdir(parents=True, exist_ok=True)
    (Path(directory) / "config.json").write_text(cfg_json)
