"""Trainer: host-side orchestration of the two-phase run.

Re-design of nerfstudio/engine/trainer.py: setup (data -> model ->
pipeline), the train loop with its callback schedule (proposal-anneal is
traced; guiding rebuild / takeover transition / eval / checkpoint are
host-side step hooks), metrics via utils.writer, checkpoints via orbax.
The reference's mp.spawn + NCCL worker fan-out (scripts/train.py:105-226)
does not exist: one process drives the SPMD program; multi-chip is the
mesh inside the jitted steps.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.methods import ExperimentConfig
from ..data.datamanager import ImageDataset, build_dataset
from ..data.dataparsers.instant_ngp import InstantNGPDataparserConfig, parse_instant_ngp
from ..engine.train_loop import eval_image_metrics
from ..models.nerfacto import NerfactoModel
from ..pipelines.nerf_emitter import NerfEmitterPipeline
from ..renderer.optimize import get_opt_config
from ..utils import profiler, writer as writer_mod
from .checkpoints import CheckpointManager


class Trainer:
    def __init__(self, config: ExperimentConfig):
        self.config = config
        self.run_dir = config.run_dir
        # multi-host: metrics/images are written once (reference
        # comms.is_main_process gating); checkpoints are NOT gated — orbax
        # saves distributed arrays collectively from all processes
        self.is_main = jax.process_index() == 0
        self.writer = writer_mod.EventWriter(self.run_dir / "logs")
        self.ckpt = CheckpointManager(self.run_dir / "checkpoints")

    def setup(self):
        cfg = self.config
        from ..plugins.registry import discover_dataparsers

        plugin_parsers = discover_dataparsers()
        if cfg.datacfg.dataparser in plugin_parsers:
            # externally-registered dataparser (plugins/registry.py,
            # mirroring nerfstudio/plugins/registry_dataparser.py)
            parse_split = plugin_parsers[cfg.datacfg.dataparser].setup(
                cfg.datacfg
            )
            dp_cfg = None

            def parse(_cfg, split):
                return parse_split(split)

        elif cfg.datacfg.dataparser == "nerfstudio-data":
            from ..data.dataparsers.nerfstudio import (
                NerfstudioDataparserConfig,
                parse_nerfstudio,
            )

            dp_cfg = NerfstudioDataparserConfig(
                data=cfg.datacfg.data,
                scene_scale=cfg.datacfg.scene_scale,
                aabb_scale=cfg.datacfg.aabb_scale,
                eval_mode=cfg.datacfg.eval_mode,
                mi_data=cfg.datacfg.mi_data,
                downscale_factor=(
                    cfg.datacfg.downscale_factor or None
                ),
            )
            parse = parse_nerfstudio
        else:
            dp_cfg = InstantNGPDataparserConfig(
                data=cfg.datacfg.data,
                scene_scale=cfg.datacfg.scene_scale,
                aabb_scale=cfg.datacfg.aabb_scale,
                eval_mode=cfg.datacfg.eval_mode,
                mi_data=cfg.datacfg.mi_data,
                test_data=cfg.datacfg.test_data,
                downscale_factor=cfg.datacfg.downscale_factor,
            )
            parse = parse_instant_ngp
        train_out = parse(dp_cfg, "train")
        self.dataset = build_dataset(train_out)
        try:
            eval_out = parse(dp_cfg, "val")
            self.eval_dataset: Optional[ImageDataset] = (
                build_dataset(eval_out) if eval_out.image_filenames else None
            )
        except Exception:
            self.eval_dataset = None
        # the mi_train split (full images for takeover renders; optional
        # alternate mi_data dir — reference mitsuba_datamanager.py:42-191)
        self.mi_dataset: Optional[ImageDataset] = None
        if cfg.datacfg.mi_data is not None:
            try:
                self.mi_dataset = build_dataset(parse(dp_cfg, "mi_train"))
            except Exception as e:
                print(f"mi_train split unavailable ({e}); using train split")

        s = cfg.datacfg.aabb_scale
        aabb = ((-s, -s, -s), (s, s, s))
        m = cfg.model
        self.model = NerfactoModel(
            aabb=aabb,
            hdr=m.hdr,
            num_nerf_samples=m.num_nerf_samples,
            num_proposal_samples=tuple(m.num_proposal_samples),
            log2_hashmap_size=m.log2_hashmap_size,
            max_res=m.max_res,
            num_cameras=max(len(self.dataset.cameras), 1),
            appearance_embedding_dim=m.appearance_embedding_dim,
            background_color=m.background_color,
            use_fake_contraction=m.use_fake_contraction,
            implementation=m.implementation,
            optimize_camera_poses=m.optimize_camera_poses,
        )
        pipe_cfg = cfg.pipeline
        # A dataset-declared object box (gen_data writes the object's true
        # extent) overrides the config default — a carve-out box smaller
        # than the object breaks TSDF init AND leaves object density in
        # the NeRF emitter. Must happen before the Rotater (its center).
        ds_box = train_out.metadata.get("object_aabb")
        if ds_box is not None:
            import dataclasses as _dc2

            pipe_cfg = _dc2.replace(
                pipe_cfg, object_aabb=tuple(map(tuple, np.asarray(ds_box)))
            )
            print(f"object_aabb from dataset: {np.asarray(ds_box).tolist()}")
        # turntable captures: build the Rotater from the dataparser's
        # rotation tags (angles) or calibrated matrices (reference
        # base_datamanager.py:478-496 rotater construction)
        self.rotater = None
        rot_ids = train_out.rotation_ids
        if rot_ids is not None and len(np.unique(np.asarray(rot_ids))) > 1:
            from ..fields.rotater import Rotater

            md = train_out.metadata
            center = jnp.asarray(
                np.mean(np.asarray(pipe_cfg.object_aabb, np.float32), axis=0)
            )
            if md.get("rotation_transform_matrices") is not None:
                self.rotater = Rotater.from_matrices(
                    jnp.asarray(md["rotation_transform_matrices"]), center
                )
            else:
                self.rotater = Rotater.from_angles(
                    md["rotation_angles"], center
                )
            print(
                f"turntable: {len(np.unique(np.asarray(rot_ids)))} rotations, "
                f"angles={list(np.asarray(md.get('rotation_angles', [])))}"
            )
        # multi-chip: one SPMD mesh over all local devices; rays/pixels
        # shard over the data axis, params replicate (the reference's
        # mp.spawn + NCCL DDP + pad_scatter protocol as one program)
        self.mesh = None
        train_cfg = cfg.train
        if jax.device_count() > 1:
            import dataclasses as _dc3

            from ..parallel.mesh import DATA_AXIS, make_mesh

            self.mesh = make_mesh()
            train_cfg = _dc3.replace(train_cfg, data_axis=DATA_AXIS)
            print(f"mesh: {jax.device_count()} devices on axis '{DATA_AXIS}'")
        # the SDF render cube should tightly bound the OBJECT (the
        # reference's padded sdf scene), independent of the NeRF aabb;
        # scene_scale therefore comes from the pipeline config.
        self.pipeline = NerfEmitterPipeline(
            pipe_cfg,
            self.model,
            train_cfg,
            get_opt_config(cfg.opt_config_name),
            self.dataset,
            mi_dataset=self.mi_dataset,
            rotater=self.rotater,
            mesh=self.mesh,
            data_axis=(None if self.mesh is None else "data"),
        )
        self.pipeline.data_dir = cfg.datacfg.data  # env.exr lookup root

        self.viewer_state = None
        if cfg.viewer_port:
            from ..viewer.server import ViewerState, make_orbit_render_fn, start_viewer

            self.viewer_state = ViewerState(
                make_orbit_render_fn(self.pipeline, self.dataset),
                save_dir=self.run_dir,
                scene_fn=self._viewer_scene_info,
            )
            start_viewer(self.viewer_state, cfg.viewer_port)

    def _viewer_scene_info(self) -> dict:
        """Scene-tree payload for the viewer (/scene): training-camera
        frustums, the object AABB, and — once takeover has fitted them —
        the GMM light clusters mapped back to world space. The reference
        exposes the same graph through viser (nerfstudio/viewer/ scene
        tree + camera frustum handles)."""
        from ..utils import coords

        info: dict = {"phase": "sdf" if self.pipeline.sdf_state is not None
                      else "nerf"}
        cams = self.dataset.cameras
        c2w = np.asarray(cams.camera_to_worlds)[:, :3, :4]
        info["cameras"] = c2w.tolist()
        aabb = getattr(self.pipeline, "object_aabb", None)
        if aabb is not None:
            info["aabb"] = np.asarray(aabb).tolist()
        sdf_state = self.pipeline.sdf_state
        if sdf_state is not None and sdf_state.scene.guiding is not None:
            g = sdf_state.scene.guiding
            pos = coords.unit_to_world(
                np.asarray(g.positions), self.config.datacfg.scene_scale
            )
            info["lights"] = {
                "positions": np.asarray(pos).tolist(),
                "weights": np.asarray(g.weights).tolist(),
            }
        return info

    @profiler.time_function
    def train(self, start_step: int = 0):
        """Training loop; start_step > 0 resumes mid-schedule (the
        reference's --load-dir + --override-start-step chaining used to run
        hdr-nerfacto -> sdf-nerfacto, scripts/real/ours/run.sh:24-25)."""
        cfg = self.config
        # serialize the run config ONLY when training: eval/render tools
        # also construct a Trainer from a loaded (and possibly overridden)
        # config, and must never clobber the run's config.json
        from ..configs.cli import save_config

        save_config(cfg, self.run_dir / "config.json")
        key = jax.random.PRNGKey(cfg.seed)
        t_start = time.time()
        n_rays = cfg.train.num_rays_per_batch

        from ..utils import capture_lock

        for step in range(start_step, cfg.max_num_iterations):
            # yield the chip/host to a driver capture window (bench /
            # multichip dryrun) between steps
            capture_lock.checkpoint()
            vs = self.viewer_state
            if vs is not None:
                # live viewer control (reference viewer train toggle):
                # pause spins here (still honoring capture windows); stop
                # checkpoints and ends the run cleanly
                while vs.paused and not vs.stop_requested:
                    capture_lock.checkpoint()
                    time.sleep(0.25)
                if vs.stop_requested:
                    if self.is_main:
                        print(f"viewer: stop requested at step {step}")
                    try:
                        self.save_checkpoint(step)
                    except Exception as e:  # step may equal a just-saved one
                        print(f"viewer stop: checkpoint skipped ({e})")
                    self.writer.close()
                    return
            key, k = jax.random.split(key)
            with profiler.time_block("train_iteration"):
                metrics = self.pipeline.train_iteration(step, k)

            if step % 10 == 0 and self.is_main:
                m = {k_: float(np.asarray(v)) for k_, v in metrics.items()}
                dt = (time.time() - t_start) / (step + 1)
                m[writer_mod.TRAIN_RAYS_PER_SEC] = n_rays / max(dt, 1e-9)
                m[writer_mod.ETA] = dt * (cfg.max_num_iterations - step)
                self.writer.put_dict(m, step)
                self.writer.maybe_print(step, m)
                self.writer.flush(step)
                if self.viewer_state is not None:
                    self.viewer_state.put_metrics(step, m)

            if self.viewer_state is not None:
                self.viewer_state.step = step
                self.viewer_state.phase = (
                    "sdf" if self.pipeline.sdf_state is not None else "nerf"
                )
            if step > 0 and step % cfg.steps_per_eval_image == 0:
                self.eval_step(step)
            if (
                step > 0
                and step != start_step
                and step % cfg.steps_per_save == 0
            ):
                # step != start_step: a resumed run's first step can land on
                # a save boundary equal to the seeded checkpoint's own step,
                # and orbax refuses saves at steps <= the directory's latest
                # (checkpoints.py raises loudly on the silent skip)
                self.save_checkpoint(step)

        self.save_checkpoint(cfg.max_num_iterations)
        self.writer.close()

    def eval_step(self, step: int):
        ds = self.eval_dataset or self.dataset
        idx = step // self.config.steps_per_eval_image % ds.images.shape[0]
        # unified serving entry: NeRF render before takeover, SDF render
        # with the live emitter after (reference render_camera_outputs).
        # NOTE: under a multi-host mesh this is a collective program —
        # every process must render; only the writes are main-gated.
        out = self.pipeline.render_camera_outputs(
            ds, int(idx), jax.random.PRNGKey(step), spp=16
        )
        m = eval_image_metrics(out["rgb"], ds.images[idx], is_hdr=ds.is_hdr)
        if not self.is_main:
            return
        self.writer.put_dict({f"eval/{k}": v for k, v in m.items()}, step)
        self.writer.put_image("eval/rgb", np.asarray(out["rgb"]), step)
        if self.pipeline.sdf_state is not None:
            self.writer.put_image(
                "eval/mask", np.asarray(out["accumulation"]).repeat(3, -1), step
            )

    def save_checkpoint(self, step: int):
        state = {"nerf": self.pipeline.nerf_state}
        if self.pipeline.sdf_state is not None:
            state["sdf"] = self.pipeline.sdf_state
        self.ckpt.save(step, state)

    def load_checkpoint(
        self,
        step: Optional[int] = None,
        nerf_only: bool = False,
        bind: bool = True,
    ):
        step = step if step is not None else self.ckpt.latest_step()
        # Inspect the on-disk shapes first: a takeover checkpoint stores the
        # SDF at whatever resolution the upsample schedule had reached, so
        # the restore template must be built at the STORED resolution — a
        # fresh begin_takeover() template (init_res) cannot restore a
        # post-upsample checkpoint. The template is also pure structure:
        # no TSDF fusion / guiding build / occlusion renders are run here
        # (everything is overwritten by the restore; the expensive work is
        # re-bound from the restored params in resume_takeover_bind).
        meta = self.ckpt.metadata_tree(step)
        has_sdf_meta = meta is not None and "sdf" in meta
        if nerf_only:
            # --load-nerf-only: read ONLY the NeRF train state. The SDF
            # subtree (if any) is read into a throwaway metadata-shaped
            # zeros template — never into a live takeover template — so
            # this path is immune to SDF optimizer/structure drift AND
            # skips the expensive takeover re-bind entirely.
            from .checkpoints import template_from_metadata

            template = {"nerf": self.pipeline.nerf_state}
            if has_sdf_meta:
                template["sdf"] = template_from_metadata(meta["sdf"])
            restored = self.ckpt.restore(template, step)
            self.pipeline.nerf_state = restored["nerf"]
            self.pipeline.sdf_state = None
            if self.mesh is not None:
                from ..parallel.mesh import replicated

                self.pipeline.nerf_state = jax.device_put(
                    self.pipeline.nerf_state, replicated(self.mesh)
                )
            return
        if has_sdf_meta and self.pipeline.sdf_state is None:
            sdf_res = int(meta["sdf"]["scene"]["sdf"].shape[0])
            self.pipeline.begin_takeover_template(sdf_res=sdf_res)
        elif meta is not None and not has_sdf_meta:
            self.pipeline.sdf_state = None
        elif (
            meta is None
            and self.pipeline.sdf_state is None
            and int(self.config.pipeline.takeover_step) < self.config.max_num_iterations
        ):
            # metadata unavailable: fall back to a blind takeover template
            self.pipeline.begin_takeover_template()
        template = {"nerf": self.pipeline.nerf_state}
        if self.pipeline.sdf_state is not None:
            template["sdf"] = self.pipeline.sdf_state
        from .checkpoints import template_from_metadata

        try:
            restored = self.ckpt.restore(template, step)
        except Exception:
            restored = None
            if "sdf" in template and has_sdf_meta:
                # The live SDF template's optimizer-state STRUCTURE can
                # drift from what the checkpoint stored (e.g. the opt
                # config's per-variable optimizer kind changed between
                # save and restore — round 4 shipped uniform_adam while
                # prod checkpoints held per-coordinate Adam moments).
                # Re-read with the on-disk opt_state structure (zeros
                # template from metadata), keep the params/means, and
                # re-init the optimizer moments fresh.
                try:
                    tmpl2 = {
                        "nerf": template["nerf"],
                        "sdf": template["sdf"].replace(
                            opt_state=template_from_metadata(
                                meta["sdf"]["opt_state"]
                            )
                        ),
                    }
                    restored = self.ckpt.restore(tmpl2, step)
                    restored["sdf"] = restored["sdf"].replace(
                        opt_state=self.pipeline.sdf_tx.init(
                            restored["sdf"].scene
                        )
                    )
                    print(
                        "checkpoint SDF optimizer structure drifted from "
                        "the current config; optimizer moments re-initialized"
                    )
                except Exception:
                    restored = None
            if restored is None:
                if "sdf" not in template:
                    raise
                # last resort: older / pretrain-only checkpoint (or an SDF
                # subtree unreadable under any current template) — restore
                # the NeRF state only
                self.pipeline.sdf_state = None
                template = {"nerf": self.pipeline.nerf_state}
                if has_sdf_meta:
                    template["sdf"] = template_from_metadata(meta["sdf"])
                restored = self.ckpt.restore(template, step)
                restored.pop("sdf", None)  # metadata zeros, not real state
                print(
                    "warning: checkpointed SDF state could not be restored "
                    "under the current config; resuming NeRF-only"
                )
        self.pipeline.nerf_state = restored["nerf"]
        if "sdf" in restored:
            self.pipeline.sdf_state = restored["sdf"]
        if self.mesh is not None:
            # restored arrays may be committed to one device; mesh programs
            # need mesh-replicated inputs
            from ..parallel.mesh import replicated

            self.pipeline.nerf_state = jax.device_put(
                self.pipeline.nerf_state, replicated(self.mesh)
            )
            if self.pipeline.sdf_state is not None:
                self.pipeline.sdf_state = jax.device_put(
                    self.pipeline.sdf_state, replicated(self.mesh)
                )
        if self.pipeline.sdf_state is not None and bind:
            # bind emitter closures / occlusion layers to the RESTORED NeRF
            # params and replay the render-res upsample schedule up to the
            # restored SDF resolution. `bind=False` callers (the exporter)
            # only need the restored arrays — skipping the bind avoids
            # occlusion renders / emitter (re-)distillation on a CPU host.
            self.pipeline.resume_takeover_bind(jax.random.PRNGKey(0))
