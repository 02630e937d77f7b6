"""Checkpoint I/O via orbax.

Re-design of the reference checkpointing (nerfstudio/engine/
trainer.py:413-486 torch.save of {step, pipeline, optimizers, scalers} +
the cross-framework Mitsuba-variable export in mitsuba_sdf.py:837-876):
everything here is ONE pytree — nerf train state, SDF opt state, guiding
mixture — so a single orbax save/restore replaces the torch<->Dr.Jit
bridging. `save_only_latest` prunes old steps like the reference flag.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp


def template_from_metadata(meta: Any) -> Any:
    """Build a zeros restore-template for a checkpoint SUBTREE from its
    on-disk metadata (`CheckpointManager.metadata_tree`), preserving the
    stored dtypes/shapes (None leaves stay None). Used when the live
    template's structure has drifted from what was saved — e.g. the SDF
    optimizer's hyper-structure changed between the save and the restore —
    so the drifted subtree can still be read (and then discarded or
    rebuilt) instead of failing the whole restore."""

    def is_leaf(x):
        return x is None or hasattr(x, "dtype") or hasattr(x, "write_shape")

    def leaf(x):
        if x is None:
            return None
        dtype = getattr(x, "dtype", None) or np.float32
        return np.zeros(tuple(getattr(x, "shape", ()) or ()), dtype=dtype)

    import jax

    return jax.tree.map(leaf, meta, is_leaf=is_leaf)


class CheckpointManager:
    def __init__(self, directory: Path, save_only_latest: bool = True):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        opts = ocp.CheckpointManagerOptions(
            max_to_keep=1 if save_only_latest else None, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=opts)

    def save(self, step: int, state: Any):
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if not saved:
            # orbax silently skips saves at steps <= the directory's latest
            # (advisor r3: the round-3 A/B seed stage lost its seed
            # checkpoints this way and the arm evaluated the wrong model) —
            # fail loudly instead
            raise RuntimeError(
                f"checkpoint save at step {step} was skipped by orbax "
                f"(directory latest: {self._mgr.latest_step()})"
            )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def metadata_tree(self, step: Optional[int] = None) -> Optional[Any]:
        """Stored-array metadata (shapes/dtypes) of a checkpoint WITHOUT a
        template — lets the restore caller build a template whose shapes
        match what is on disk (the SDF upsample schedule changes the grid
        resolution mid-run, so a fresh-init template has the wrong shape).
        Returns the metadata pytree (dict mirroring the saved state, leaves
        with `.shape`) or None when unavailable."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        try:
            ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
            meta = ckptr.metadata(self.directory / str(step) / "default")
            item = getattr(meta, "item_metadata", meta)
            return getattr(item, "tree", item)
        except Exception:
            return None

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self):
        self._mgr.close()
