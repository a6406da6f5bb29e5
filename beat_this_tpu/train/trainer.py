"""Training loop: SPMD steps, validation, checkpointing, resume.

Replaces the reference's PyTorch-Lightning Trainer usage
(launch_scripts/train.py:118-132) with an explicit loop around the jitted
train step: host-side batch assembly runs on a prefetch thread, batches are
placed sharded over the mesh, one `train_step` call performs the 8-microbatch
accumulation and optimizer update on device, validation runs every
`val_frequency` epochs (middle excerpts + minimal postprocessing + F-measure/
Cemgil, reference pl_module.py:207-222), and a reference-compatible
Lightning-style ``.ckpt`` (plus resume state: optimizer leaves, step, epoch)
is written after every epoch.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from beat_this_tpu.io.torch_ckpt import (
    load_torch_checkpoint,
    pytree_to_torch_state_dict,
    torch_state_dict_to_pytree,
)
from beat_this_tpu.io.torch_save import save_torch_checkpoint
from beat_this_tpu.metrics import Metrics
from beat_this_tpu.model import BeatThisConfig
from beat_this_tpu.parallel import make_mesh
from beat_this_tpu.parallel.mesh import usable_data_devices
from beat_this_tpu.postprocessing import Postprocessor
from beat_this_tpu.train.task import (
    TrainConfig,
    TrainState,
    dropout_key,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def _prefetch(iterator, depth: int = 2):
    """Run `iterator` on a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                if stop.is_set():
                    return
                q.put(item)
        finally:
            q.put(None)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            yield item
    finally:
        stop.set()


class Trainer:
    def __init__(
        self,
        model_config: BeatThisConfig,
        train_config: TrainConfig,
        datamodule,
        max_epochs: int = 100,
        val_frequency: int = 5,
        checkpoint_dir="checkpoints",
        name: str = "",
        seed: int = 0,
        use_mesh: bool = True,
        use_dbn: bool = False,
        eval_trim_beats: float = 5,
        fps: int = 50,
        log_file=None,
    ):
        self.model_config = model_config
        self.tc = train_config
        self.dm = datamodule
        self.max_epochs = max_epochs
        self.val_frequency = val_frequency
        self.checkpoint_dir = Path(checkpoint_dir)
        self.name = name or "beat_this_tpu"
        self.seed = seed
        self.fps = fps
        self.use_dbn = use_dbn
        self.eval_trim_beats = eval_trim_beats
        n_data = usable_data_devices(datamodule.batch_size)
        self.mesh = make_mesh(n_data) if use_mesh and n_data > 1 else None
        if self.mesh is not None:
            print(f"Data-parallel over {n_data} devices")
        self.postprocessor = Postprocessor(
            type="dbn" if use_dbn else "minimal", fps=fps
        )
        self.metrics = Metrics(eval_trim_beats=eval_trim_beats)
        self.log_file = Path(log_file) if log_file else None
        self.history: list[dict] = []
        self.wandb_run = None
        self._eval_step_fn = None

    @property
    def eval_step(self):
        """The jitted eval step, built once — a fresh `jax.jit` wrapper per
        validation epoch would discard XLA's compilation cache and recompile
        every time."""
        if self._eval_step_fn is None:
            self._eval_step_fn = jax.jit(
                make_eval_step(self.model_config, self.tc)
            )
        return self._eval_step_fn

    def init_wandb(self, project="beat_this_tpu", name=None, resume_id=None):
        """Optional Weights & Biases logging (counterpart of the reference's
        WandbLogger, launch_scripts/train.py:21-30); no-op if wandb is not
        installed."""
        try:
            import wandb
        except ImportError:
            print("wandb not installed; falling back to stdout/jsonl logging")
            return None
        kwargs = {"id": resume_id, "resume": "must"} if resume_id else {}
        self.wandb_run = wandb.init(
            project=project, name=name or self.name,
            config={**self.hyper_parameters(), **self.dm.hparams()}, **kwargs,
        )
        return self.wandb_run

    # -- logging -----------------------------------------------------------
    def log(self, record: dict):
        record = {k: (float(v) if hasattr(v, "item") else v) for k, v in record.items()}
        self.history.append(record)
        if jax.process_index() != 0:
            return
        printable = ", ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in record.items()
        )
        print(printable, flush=True)
        if self.log_file:
            self.log_file.parent.mkdir(parents=True, exist_ok=True)
            with open(self.log_file, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self.wandb_run is not None:
            self.wandb_run.log(record)

    # -- checkpointing -----------------------------------------------------
    def hyper_parameters(self) -> dict:
        """Mirror PLBeatThis's persisted hparams (pl_module.py:22-44) so our
        checkpoints interoperate with the reference stack."""
        c, tc = self.model_config, self.tc
        return {
            "spect_dim": c.spect_dim,
            "fps": self.fps,
            "transformer_dim": c.transformer_dim,
            "ff_mult": c.ff_mult,
            "n_layers": c.n_layers,
            "stem_dim": c.stem_dim,
            "dropout": {
                "frontend": c.dropout_frontend,
                "transformer": c.dropout_transformer,
            },
            "lr": tc.lr,
            "weight_decay": tc.weight_decay,
            "pos_weights": {
                "beat": tc.pos_weight_beat,
                "downbeat": tc.pos_weight_downbeat,
            },
            "head_dim": c.head_dim,
            "loss_type": tc.loss_type,
            "warmup_steps": tc.warmup_steps,
            "max_epochs": self.max_epochs,
            "use_dbn": self.use_dbn,
            "eval_trim_beats": self.eval_trim_beats,
            "sum_head": c.sum_head,
            "partial_transformers": c.partial_transformers,
        }

    def save_checkpoint(self, ts: TrainState, epoch: int, path=None):
        if jax.process_index() != 0:
            return None  # rank 0 writes; params are replicated
        path = Path(path) if path else (
            self.checkpoint_dir / f"{self.name}-S{self.seed}.ckpt"
        )
        params = jax.device_get(ts.params)
        bn_state = jax.device_get(ts.bn_state)
        sd = pytree_to_torch_state_dict(params, bn_state)
        opt_leaves = [
            np.asarray(x) for x in jax.tree_util.tree_leaves(jax.device_get(ts.opt_state))
        ]
        ckpt = {
            "state_dict": {"model." + k: v for k, v in sd.items()},
            "hyper_parameters": self.hyper_parameters(),
            "datamodule_hyper_parameters": self.dm.hparams(),
            "pytorch-lightning_version": "2.0.0",
            "beat_this_tpu": {
                "step": int(jax.device_get(ts.step)),
                "epoch": epoch,
                "opt_leaves": {str(i): leaf for i, leaf in enumerate(opt_leaves)},
            },
        }
        save_torch_checkpoint(ckpt, path)
        return path

    def load_checkpoint(self, path) -> tuple[TrainState, int]:
        ckpt = load_torch_checkpoint(path)
        params, bn_state = torch_state_dict_to_pytree(
            ckpt["state_dict"], self.model_config
        )
        ts = init_train_state(params, bn_state, self.tc)
        epoch = 0
        extra = ckpt.get("beat_this_tpu")
        if extra:
            leaves = [
                jnp.asarray(extra["opt_leaves"][str(i)])
                for i in range(len(extra["opt_leaves"]))
            ]
            treedef = jax.tree_util.tree_structure(ts.opt_state)
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
            ts = TrainState(
                ts.params, ts.bn_state, opt_state,
                jnp.asarray(extra["step"], jnp.int32),
            )
            epoch = int(extra["epoch"])
        return ts, epoch

    # -- sharding ----------------------------------------------------------
    def _place(self, ts: TrainState) -> TrainState:
        if self.mesh is None:
            return ts
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), ts)

    def _shard_train_batch(self, batch):
        arrays = {
            k: v for k, v in batch.items() if isinstance(v, np.ndarray)
        }
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        if jax.process_count() > 1:
            # multi-host: `arrays` holds only this process's micro slice
            # (dm.train_batches(host_shard=...)); assemble the global
            # jax.Array from the per-process shards without any host ever
            # materializing the full global batch
            from beat_this_tpu.parallel.distributed import shard_host_batch

            return shard_host_batch(arrays, self.mesh, P(None, "data"))
        sharding = NamedSharding(self.mesh, P(None, "data"))
        return {k: jax.device_put(v, sharding) for k, v in arrays.items()}

    # -- main loop ---------------------------------------------------------
    def fit(self, resume_path=None, max_steps_override=None):
        from beat_this_tpu.model import init_beat_this

        self.dm.setup("fit")
        steps_per_epoch = self.dm.steps_per_epoch(self.tc.accum_steps)
        if steps_per_epoch == 0:
            raise ValueError("dataset too small for one optimizer step")
        self.tc.max_steps = steps_per_epoch * self.max_epochs
        train_step = jax.jit(make_train_step(self.model_config, self.tc))
        eval_loop_rng = dropout_key(self.seed)

        if resume_path:
            ts, start_epoch = self.load_checkpoint(resume_path)
        else:
            params, bn_state = init_beat_this(self.seed, self.model_config)
            ts = init_train_state(params, bn_state, self.tc)
            start_epoch = 0
        ts = self._place(ts)
        _, schedule = make_optimizer(self.tc)

        batches = _prefetch(
            self.dm.train_batches(
                self.tc.accum_steps, seed=self.seed,
                host_shard=(jax.process_index(), jax.process_count()),
            )
        )
        for epoch in range(start_epoch, self.max_epochs):
            epoch_losses = []
            t0 = time.time()
            data_wait = 0.0
            for _ in range(steps_per_epoch):
                tw = time.time()
                host_batch = next(batches)
                data_wait += time.time() - tw
                batch = self._shard_train_batch(host_batch)
                step_rng = jax.random.fold_in(eval_loop_rng, int(ts.step))
                ts, parts = train_step(ts, batch, step_rng)
                epoch_losses.append(parts)
                if max_steps_override and int(jax.device_get(ts.step)) >= max_steps_override:
                    break
            losses = {
                f"train_loss_{k}": float(np.mean([jax.device_get(p[k]) for p in epoch_losses]))
                for k in ("beat", "downbeat", "total")
            }
            elapsed = time.time() - t0
            self.log(
                {
                    "epoch": epoch,
                    **losses,
                    "lr": float(schedule(int(jax.device_get(ts.step)))),
                    "time_s": round(elapsed, 1),
                    # time blocked waiting for host batch assembly: ~0 means
                    # the input pipeline keeps ahead of the device; if it
                    # approaches time_s, assembly is the bottleneck (SURVEY
                    # §7 hard part 5)
                    "data_wait_s": round(data_wait, 3),
                }
            )
            if (epoch + 1) % self.val_frequency == 0:
                self.validate(ts, epoch)
            self.save_checkpoint(ts, epoch + 1)
            if max_steps_override and int(jax.device_get(ts.step)) >= max_steps_override:
                break
        return ts

    def validate(self, ts: TrainState, epoch: int):
        eval_step = self.eval_step
        all_losses, all_metrics = [], []
        for batch in self.dm.val_batches():
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            out, parts = eval_step(ts.params, ts.bn_state, arrays)
            # the datamodule zero-pads the final ragged batch to the compiled
            # batch shape (no retrace); the padded rows contribute zero loss
            # numerator, so rescaling the mean by rows/n_valid is exact
            n_valid = batch.get("n_valid", len(batch["padding_mask"]))
            scale = len(batch["padding_mask"]) / n_valid
            all_losses.append(
                {k: float(jax.device_get(v)) * scale for k, v in parts.items()}
            )
            beat, downbeat = self.postprocessor(
                np.asarray(out["beat"]), np.asarray(out["downbeat"]),
                batch["padding_mask"],
            )
            for i in range(n_valid):
                m_beat = self.metrics(
                    batch["truth_orig_beat"][i], beat[i], step="val"
                )
                m_down = self.metrics(
                    batch["truth_orig_downbeat"][i], downbeat[i], step="val"
                )
                all_metrics.append(
                    {
                        **{f"{k}_beat": v for k, v in m_beat.items()},
                        **{f"{k}_downbeat": v for k, v in m_down.items()},
                    }
                )
        record = {"epoch": epoch}
        if all_losses:
            for k in all_losses[0]:
                record[f"val_loss_{k}"] = float(np.mean([x[k] for x in all_losses]))
        if all_metrics:
            for k in all_metrics[0]:
                record[f"val_{k}"] = float(np.mean([x[k] for x in all_metrics]))
        self.log(record)
        return record

    def test(self, ts: TrainState):
        """Full-piece prediction + test metrics on the test split (reference
        predict/test path, pl_module.py:224-277), batched over piece groups
        so the whole split costs a handful of device dispatches."""
        from beat_this_tpu.inference import (
            ChunkedPredictor,
            LoadedModel,
            predict_postprocess_batched,
        )

        self.dm.setup("test")
        predictor = ChunkedPredictor(
            LoadedModel(
                self.model_config,
                jax.device_get(ts.params),
                jax.device_get(ts.bn_state),
            ),
            compute_dtype=jnp.bfloat16
            if self.tc.compute_dtype == "bfloat16"
            else jnp.float32,
        )
        piece_metrics, datasets = [], []
        self.dm.predict_dataset = self.dm.test_dataset
        for piece, beat, downbeat in predict_postprocess_batched(
            predictor, self.postprocessor, self.dm.predict_pieces()
        ):
            m_beat = self.metrics(piece["truth_orig_beat"], beat, step="test")
            m_down = self.metrics(
                piece["truth_orig_downbeat"], downbeat, step="test"
            )
            piece_metrics.append(
                {
                    **{f"{k}_beat": v for k, v in m_beat.items()},
                    **{f"{k}_downbeat": v for k, v in m_down.items()},
                }
            )
            datasets.append(piece["dataset"])
        record = {}
        if piece_metrics:
            for k in piece_metrics[0]:
                record[f"test_{k}"] = float(np.mean([x[k] for x in piece_metrics]))
        self.log(record)
        return record, piece_metrics, datasets
