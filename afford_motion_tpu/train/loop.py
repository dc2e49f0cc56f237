"""Training loop (reference: utils/training.py:11-180).

One jitted, donated train step: hierarchy build -> q_sample -> denoiser
forward (train mode, mutable BatchNorm) -> masked MSE -> grads -> AdamW.
Data parallelism is jit-over-Mesh GSPMD (parallel/mesh.py): batches are
sharded on the ``data`` axis, gradients all-reduce over ICI automatically,
no DDP machinery. Checkpoints are Orbax, step-named ``model{step:06d}``
like the reference's .pt files (utils/training.py:92-109)."""
from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


from ..diffusion import GaussianDiffusion
from ..models.cdm import CDM
from ..models.conditioning import add_hierarchies, host_prepare_cond
from ..models.text import TextEncoder
from ..parallel.mesh import create_mesh_for_batch, replicate, shard_batch
from ..utils.io import Board, get_logger, mkdir_if_not_exists
from .checkpoint import load_ckpt, save_ckpt
from .state import TrainState, make_optimizer

logger = get_logger()


def make_train_step(model, diffusion: GaussianDiffusion, sampler=None,
                    steps_per_dispatch: int = 1, assemble=None):
    """Build the jitted training step. Donates the state so the optimizer
    update is in-place in HBM.

    ``sampler``: optional LossSecondMomentResampler for importance-sampled
    timesteps (reference: diffusion/resample.py:130-160); when given, the
    step signature grows a sampler_state operand and returns its update.
    Default (None) is the uniform sampler every shipped config uses.

    ``steps_per_dispatch`` > 1 scans that many optimizer steps inside ONE
    compiled dispatch over stacked (G, B, ...) megabatches — amortizing
    host->device transfer + dispatch latency, which otherwise serializes
    with compute (decisive on remote/tunneled TPU backends)."""

    use_importance = sampler is not None

    def _as_key(rng):
        """Accept a PRNGKey or a plain integer seed. Deriving the key from
        an integer *inside* the jitted step avoids a per-dispatch
        jax.random.split on the main thread — a tiny device program whose
        round-trip is pure overhead on remote/tunneled backends."""
        rng = jnp.asarray(rng)
        if rng.dtype == jnp.uint32 and rng.ndim >= 1:
            return rng
        return jax.random.PRNGKey(rng)

    def train_step(state: TrainState, x, cond, rng, sampler_state=None):
        if assemble is not None:
            # device-store mode: ``x`` is the (B,) item-row index array and
            # ``cond`` the small host-drawn metadata; the batch is gathered
            # from the HBM-resident corpus right here
            x, cond = assemble({"item_row": x, **cond})
        # half_wire_x ships the target at f16; q_sample/loss run in f32
        x = x.astype(jnp.float32)
        rng_t, rng_noise, rng_drop = jax.random.split(_as_key(rng), 3)
        B = x.shape[0]
        if use_importance:
            t, weights = sampler.sample(rng_t, B, sampler_state)
        else:
            t = jax.random.randint(rng_t, (B,), 0, diffusion.num_timesteps)
            weights = jnp.ones((B,), dtype=jnp.float32)
        cond_h = add_hierarchies(model, cond)
        x_mask = cond_h.get("x_mask")

        def loss_fn(params):
            captured = {}

            def model_fn(x_t, ts):
                variables = {"params": params, "batch_stats": state.batch_stats}
                out = model.apply(
                    variables, x_t, ts, cond_h, train=True,
                    rngs={"dropout": rng_drop}, mutable=["batch_stats"],
                )
                out, updates = out
                captured["batch_stats"] = updates["batch_stats"]
                return out

            terms = diffusion.training_losses(
                model_fn, x, t, rng_noise, x_mask=x_mask
            )
            return (terms["loss"] * weights).mean(), (terms, captured.get("batch_stats"))

        (loss, (terms, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {
            "loss": loss,
            "mse": terms.get("mse", terms["loss"]).mean(),
            "grad_norm": jnp.sqrt(
                sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
            ),
        }
        if use_importance:
            new_sampler_state = sampler.update(sampler_state, t, terms["loss"])
            return new_state, metrics, new_sampler_state
        return new_state, metrics

    if steps_per_dispatch <= 1:
        return jax.jit(train_step, donate_argnums=(0,))

    G = steps_per_dispatch

    def multi_step(state: TrainState, xs, conds, rng, sampler_state=None):
        key = _as_key(rng)

        def body(carry, inp):
            st, sstate = carry
            i, x, cond = inp
            sub_rng = jax.random.fold_in(key, i)
            if use_importance:
                st, metrics, sstate = train_step(st, x, cond, sub_rng, sstate)
            else:
                st, metrics = train_step(st, x, cond, sub_rng)
            return (st, sstate), metrics

        (state, sampler_state), ms = jax.lax.scan(
            body, (state, sampler_state),
            (jnp.arange(G), xs, conds),
        )
        metrics = jax.tree_util.tree_map(lambda a: a[-1], ms)
        if use_importance:
            return state, metrics, sampler_state
        return state, metrics

    return jax.jit(multi_step, donate_argnums=(0,))


class TrainLoop:
    """Step-driven training with resume / periodic save / board logging
    (reference: utils/training.py:11-180). No EMA / grad clipping /
    accumulation — matching the reference's trainer."""

    def __init__(
        self,
        cfg: Any,
        model,
        diffusion: GaussianDiffusion,
        dataloader,
        text_encoder: TextEncoder,
        *,
        exp_dir: str = "outputs/exp",
        seed: int = 2023,
    ):
        self.cfg = cfg
        tcfg = cfg.task.train
        self.model = model
        self.diffusion = diffusion
        self.dataloader = dataloader
        self.text_encoder = text_encoder

        self.lr = float(tcfg.lr)
        self.weight_decay = float(tcfg.get("weight_decay", 0.0))
        self.lr_anneal_steps = int(tcfg.get("lr_anneal_steps", 0))
        self.max_steps = int(tcfg.max_steps)
        self.log_every_step = int(tcfg.get("log_every_step", 100))
        self.save_every_step = int(tcfg.get("save_every_step", 10000))
        self.resume_ckpt = str(tcfg.get("resume_ckpt", "") or "")
        # capture a jax.profiler trace for this many steps after warmup
        # (0 = off); written to <exp_dir>/log/profile
        self.profile_steps = int(tcfg.get("profile_steps", 0))

        self.exp_dir = exp_dir
        self.ckpt_dir = mkdir_if_not_exists(os.path.join(exp_dir, "ckpt"))
        self.mesh = create_mesh_for_batch(int(tcfg.batch_size))
        self._base_seed = int(seed)
        self.rng = jax.random.PRNGKey(seed)
        self._maybe_enable_banded()

        self.state = self._init_state()
        sampler_type = str(tcfg.get("schedule_sampler_type", "uniform"))
        if sampler_type in ("loss-second-moment", "loss_second_moment"):
            from ..diffusion import LossSecondMomentResampler

            self._sampler = LossSecondMomentResampler(diffusion.num_timesteps)
            self._sampler_state = self._sampler.init_state()
        else:
            self._sampler = None
            self._sampler_state = None
        self.steps_per_dispatch = int(tcfg.get("steps_per_dispatch", 4))
        if self.steps_per_dispatch > self.max_steps:
            self.steps_per_dispatch = 1

        # device-resident corpus: host streams only indices (device_store.py)
        self._dstore = None
        self._assemble = None
        if str(tcfg.get("device_store", "auto")) != "off":
            from .device_store import MAX_BYTES, DeviceStore, make_assemble_fn

            n_dev = len(self.mesh.devices.ravel())
            # task.train.device_store_shard: 'auto' (shard the corpus rows
            # over the mesh whenever it has >1 device — fetch moves ~B rows
            # over ICI per step, bit-identical to replication) or 'off'
            # (every device holds a full copy, the round-2 behavior). With
            # sharding the HBM budget is the AGGREGATE mesh budget —
            # AM_DEVICE_STORE_MAX_GB becomes per-mesh, replacing the
            # reference's per-rank DistributedSampler split
            # (train_ddp.py:50) at the storage level.
            shard_mode = str(tcfg.get("device_store_shard", "auto"))
            do_shard = shard_mode != "off" and n_dev > 1
            budget = MAX_BYTES * (n_dev if do_shard else 1)
            store = DeviceStore.try_build(self.dataloader.dataset,
                                          max_bytes=budget)
            if store is not None:
                # precompute the full per-scene hierarchy once (same
                # kernels the in-step rebuild would use — numerics
                # unchanged, ~14% of the step saved; device_store.py)
                store.add_geometry_cache(self.model, max_bytes=budget)
                # host-staged upload: sharded arrays go straight to their
                # target NamedSharding (never staging the full corpus on
                # one device — the aggregate-HBM budget is honest)
                if do_shard:
                    store.shard_over_mesh(self.mesh)
                else:
                    store.ensure_device(self.mesh)
                self._dstore = store
                self._assemble = make_assemble_fn(store)

        self.train_step = make_train_step(
            self.model, diffusion, sampler=self._sampler,
            steps_per_dispatch=self.steps_per_dispatch,
            assemble=self._assemble,
        )

    def _maybe_enable_banded(self) -> None:
        """Enable the banded windowed-neighborhood kernels when the data
        supports them: Morton-sorted packed store(s) + fps-only geometry
        wire (so every neighborhood index is produced on device by the
        windowed kNN). Carried on the model (``use_banded`` attribute ->
        LevelGeometry.banded static field), NOT process-global state —
        eval/test paths in the same process keep exact numerics. See
        ops/pallas/banded.py."""
        ds = self.dataloader.dataset
        dcfg = getattr(ds, "cfg", None)
        if dcfg is None or not bool(dcfg.get("use_banded", True)):
            return
        if str(dcfg.get("geometry_wire", "full")) != "fps":
            return
        packed = getattr(ds, "_packed", None)
        stores = (
            list(packed.values()) if isinstance(packed, dict)
            else ([packed] if packed is not None else [])
        )
        if stores and all(st.meta.get("morton") for st in stores):
            curves = {st.meta.get("curve", "morton") for st in stores}
            self.model = self.model.clone(use_banded=True)
            logger.info(
                "banded windowed-neighborhood kernels enabled "
                f"({'/'.join(sorted(str(c) for c in curves))}-sorted packed "
                "data, fps geometry wire)"
            )

    # ------------------------------------------------------------------ init
    def _example_inputs(self):
        batch = next(iter(self.dataloader))
        x, cond = host_prepare_cond(batch, self.text_encoder)
        return jnp.asarray(x), {k: jnp.asarray(v) for k, v in cond.items()}

    def _init_state(self) -> TrainState:
        x, cond = self._example_inputs()
        cond_h = add_hierarchies(self.model, cond)
        t = jnp.zeros((x.shape[0],), dtype=jnp.int32)
        init_rng, self.rng = jax.random.split(self.rng)
        variables = jax.jit(
            lambda: self.model.init(
                {"params": init_rng, "dropout": init_rng}, x, t, cond_h, train=False
            )
        )()
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        params, batch_stats = self._maybe_load_pretrained_scene(params, batch_stats)
        n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
        logger.info(f"Model initialized: {n_params / 1e6:.2f}M params")

        tx = make_optimizer(
            self.lr, self.weight_decay, self.lr_anneal_steps, params=params
        )
        state = TrainState.create(params=params, batch_stats=batch_stats, tx=tx)

        if self.resume_ckpt:
            state = load_ckpt(state, self.resume_ckpt)
            logger.info(f"Resumed from {self.resume_ckpt} at step {int(state.step)}")
        return replicate(state, self.mesh)

    def _maybe_load_pretrained_scene(self, params, batch_stats):
        """Graft the converted frozen PointTransformer scene weights into a
        CDM's params (reference: models/functions.py:96-126 +
        pointtransformer.py:203-213 load the torch .pth at construction)."""
        mcfg = getattr(self.cfg, "model", {})
        scfg = mcfg.get("scene_model", {}) if hasattr(mcfg, "get") else {}
        weight = str(scfg.get("pretrained_weight", "") or "")
        if "scene_model" not in params or not weight or not os.path.exists(weight):
            if "scene_model" in params:
                logger.warning(
                    f"pretrained scene weights not found at {weight!r}; "
                    "the frozen scene model keeps its random init"
                )
            return params, batch_stats
        from ..utils.torch_convert import convert_pointtransformer_seg

        converted = convert_pointtransformer_seg(weight)
        params = dict(params)
        params["scene_model"] = converted["params"]
        batch_stats = dict(batch_stats)
        batch_stats["scene_model"] = converted["batch_stats"]
        logger.info(f"Loaded pretrained scene model from {weight}")
        return params, batch_stats

    def _drop_cond_suffixes(self) -> tuple:
        """Geometry-cache fields the model never reads. An encoder-only
        SceneMap (CMDM trans_enc) uses no 3-NN up-interpolation, so the
        up_idx/up_weight arrays (~20% of the wire) are cut host-side."""
        if getattr(self.model, "needs_up_interpolation", True):
            return ()
        return ("_up_idx", "_up_weight")

    # ------------------------------------------------------------------ loop
    def run_loop(self) -> None:
        step = int(jax.device_get(self.state.step))
        epoch = 0
        t_start = time.time()
        steps_done_window = 0
        board = Board()

        G = self.steps_per_dispatch
        steps_per_epoch = max(len(self.dataloader), 1)
        drop = self._drop_cond_suffixes()

        # Megabatch mode: draw ONE (G*B) batch from the loader and view it
        # as (G, B, ...) — the collate stack is the only host copy. The
        # grouped fallback (np.stack over G separate batches) pays a second
        # full copy of the wire, which is decisive on a single-core host.
        B = int(self.dataloader.batch_size)
        n_items = len(self.dataloader.dataset)
        mega = G > 1 and n_items >= G * B and getattr(
            self.dataloader, "drop_last", False
        )

        if self._dstore is not None:
            # index-stream pipeline: per (G*B) megabatch the host draws
            # caption/crop/mix metadata and ships a few KB
            dset = self.dataloader.dataset
            store = self._dstore
            # Exact crash-resume (the reference's resume is step-level only,
            # utils/training.py:55-82): the host randomness for megabatch g
            # (caption choice, crop start, mix/flag-transform draws) is a
            # pure function of (base_seed, g) via EXPLICIT generator
            # instances — not seeded globals, which other threads (e.g. a
            # concurrent Orbax save) share — so a run resumed from the
            # step-N checkpoint replays the exact uninterrupted stream
            # (tests/test_resume.py, sensitivity-checked). The prefetcher
            # worker calls prepare sequentially in stream order, so the
            # counter is race-free.
            import random as _random

            group_counter = [int(jax.device_get(self.state.step)) // G]

            def prepare(ids):
                gi = group_counter[0]
                group_counter[0] += 1
                py_rng = _random.Random(
                    (self._base_seed * 1000003 + gi) & 0xFFFFFFFF)
                np_rng = np.random.RandomState(
                    (self._base_seed * 69069 + gi * 40503 + 12345) & 0x7FFFFFFF)
                meta = store.draw_batch(dset, ids, py_rng=py_rng, np_rng=np_rng)
                texts = meta.pop("c_text")
                emb, tok_pad = self.text_encoder.encode_tokens(texts)
                meta["text_emb"] = emb.astype(np.float16)
                if getattr(self.text_encoder, "per_token", False):
                    meta["text_token_mask"] = tok_pad
                xs = meta.pop("item_row").reshape(G, B)
                conds = {
                    k: np.asarray(v).reshape(G, B, *np.asarray(v).shape[1:])
                    for k, v in meta.items()
                }
                return xs, conds

            # resume-aware epoch stream (device_store.index_stream): a
            # crash-resume re-enters the same epoch/chunk position instead
            # of replaying the corpus; the loader's shuffle seed folds in
            from .device_store import index_stream

            start_step = step
            loader_seed = int(getattr(self.dataloader, "seed", 0))

            def batch_groups():
                return index_stream(
                    n_items, G, B, start_step, self._base_seed, loader_seed
                )
        else:
            if mega:
                self.dataloader.batch_size = G * B

            def prepare(group):
                if mega:
                    x, cond = host_prepare_cond(group, self.text_encoder, drop)
                    xs = np.asarray(x).reshape(G, B, *x.shape[1:])
                    conds = {
                        k: np.asarray(v).reshape(G, B, *v.shape[1:])
                        for k, v in cond.items()
                    }
                    return xs, conds
                prepared = [host_prepare_cond(b, self.text_encoder, drop) for b in group]
                xs = np.stack([np.asarray(x) for x, _ in prepared])
                keys = prepared[0][1].keys()
                conds = {k: np.stack([c[k] for _, c in prepared]) for k in keys}
                return xs, conds

            start_step = step
            if start_step and not (mega or G == 1):
                logger.warning(
                    "resume on the grouped small-corpus path replays the "
                    "data stream from epoch 0 (exact fast-forward needs "
                    "megabatch, G=1, or the device store)"
                )

            def batch_groups():
                # resume fast-forward: jump to the (epoch, batch) position
                # the uninterrupted run would be at — each yielded group
                # advances the step counter by G, and skipped batches cost
                # index arithmetic only (loader.iter_batches)
                group = []
                if mega or G == 1:
                    E = max(1, len(self.dataloader))
                    start_group = start_step // G
                    ep, off = start_group // E, start_group % E
                else:
                    ep, off = epoch, 0
                while True:  # continuous stream; consumer breaks at max_steps
                    self.dataloader.set_epoch(ep)
                    for b in self.dataloader.iter_batches(skip=off):
                        if mega:
                            yield b
                            continue
                        group.append(b)
                        if len(group) == G:
                            yield group
                            group = []
                    off = 0
                    ep += 1

        from ..parallel.mesh import DevicePrefetcher

        # background thread: text encode + one stacked host->device transfer
        # per G optimizer steps, overlapped with the previous dispatch
        prefetcher = DevicePrefetcher(batch_groups, prepare, self.mesh, batch_dim=1)
        profile_start = 2 * G if self.profile_steps > 0 else -1
        profile_stop = profile_start + self.profile_steps
        profiling = False
        # AM_LOOP_TIMING=1: log a per-phase wall-time breakdown every
        # log_every_step (pipeline diagnosis on remote/tunneled backends)
        timing = os.environ.get("AM_LOOP_TIMING", "") == "1"
        tm = {"wait_batch": 0.0, "dispatch": 0.0, "metrics_get": 0.0, "other": 0.0}
        t_mark = time.time()

        def mark(key):
            nonlocal t_mark
            now = time.time()
            tm[key] += now - t_mark
            t_mark = now

        pf_iter = iter(prefetcher)
        try:
            while True:
                mark("other")
                try:
                    xs, conds = next(pf_iter)
                except StopIteration:
                    break
                mark("wait_batch")
                if step >= self.max_steps:
                    break
                if profile_start >= 0 and step >= profile_start and not profiling:
                    jax.profiler.start_trace(os.path.join(self.exp_dir, "log", "profile"))
                    profiling = True
                if profiling and step >= profile_stop:
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info("profiler trace written to log/profile")
                epoch = step // steps_per_epoch
                if os.environ.get("AM_DEBUG_BATCH_HASH"):
                    import hashlib

                    h = hashlib.sha1()
                    for leaf in jax.tree_util.tree_leaves((xs, conds)):
                        h.update(np.asarray(leaf).tobytes())
                    logger.info(f"batch-hash step={step}: {h.hexdigest()[:16]}")
                if G == 1:
                    xs, conds = xs[0], jax.tree_util.tree_map(lambda a: a[0], conds)
                # integer seed, mixed on device inside the jitted step —
                # deterministic across resume (function of base seed + step)
                # and free of a per-dispatch jax.random.split round-trip
                step_rng = np.uint32(
                    (self._base_seed * 2654435761 + step) & 0xFFFFFFFF
                )
                if self._sampler is not None:
                    self.state, metrics, self._sampler_state = self.train_step(
                        self.state, xs, conds, step_rng, self._sampler_state
                    )
                else:
                    self.state, metrics = self.train_step(self.state, xs, conds, step_rng)
                mark("dispatch")
                step += G
                steps_done_window += G

                if step % self.log_every_step < G:
                    m = jax.device_get(metrics)
                    mark("metrics_get")
                    dt = time.time() - t_start
                    sps = steps_done_window / max(dt, 1e-9)
                    logger.info(
                        f"step {step}/{self.max_steps} | epoch {epoch} | "
                        f"loss {float(m['loss']):.6f} | mse {float(m['mse']):.6f} | "
                        f"{sps:.2f} steps/s"
                    )
                    board.write(
                        {
                            "train/loss": float(m["loss"]),
                            "train/mse": float(m["mse"]),
                            "train/epoch": epoch,
                            "train/steps_per_sec": sps,
                            "step": step,
                        }
                    )
                    if timing:
                        total = sum(tm.values()) or 1e-9
                        logger.info(
                            "loop timing | " + " | ".join(
                                f"{k} {v:.2f}s ({100 * v / total:.0f}%)"
                                for k, v in tm.items()
                            )
                        )
                        for k in tm:
                            tm[k] = 0.0
                    t_start = time.time()
                    steps_done_window = 0

                if step % self.save_every_step < G:
                    self.save(step)
        finally:
            if profiling:
                jax.profiler.stop_trace()
            prefetcher.close()

        if step % self.save_every_step >= G:
            self.save(step)

    def save(self, step: int) -> None:
        path = os.path.join(self.ckpt_dir, f"model{step:06d}")
        save_ckpt(self.state, path)
        logger.info(f"Saved checkpoint to {path}")
