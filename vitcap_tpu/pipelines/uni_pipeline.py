"""Experiment orchestration: the UniPipeline lifecycle.

TPU-native re-design of the reference pipeline base
(/root/reference/src/pipelines/uni_pipeline.py:91-1130):

- same experiment layout (`output/<full_expid>/snapshot`,
  `model_iter_{:07d}`), artifact naming (`<ckpt>.<data>.<split>…predict.tsv`,
  `<predict>.report`), mtime caching (`worth_create`), `parameters_*.yaml`
  snapshots, `30e`-style iteration parsing, per-rank prediction shards merged
  + key-reordered/deduped by process 0;
- the training loop is jit-stepped (solver.train_step) instead of
  eager + DDP: grads sync implicitly through the mesh; NaN detection saves a
  NaN_context snapshot and raises (reference trainer.py:134-137);
- multi-host topology comes from jax.process_index()/process_count() instead
  of MPI env ranks.
"""

from __future__ import annotations

import json
import logging
import os.path as op
import time
from typing import Any, Dict, Iterator, Optional

import numpy as np

from ..utils.common import (
    Config, ensure_directory, init_logging, save_parameters, worth_create,
    write_to_yaml_file,
)
from ..utils.meters import MetricLogger
from ..data.tsv import (
    concat_tsv_files, delete_tsv_files, reorder_tsv_keys, tsv_writer,
)
from ..data.dataset import (
    BatchSampler, DataLoader, DatasetPlusTransform, DistributedSampler,
    IterationBasedBatchSampler,
)


def get_mpi_rank() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:                              # pragma: no cover
        return 0


def get_mpi_size() -> int:
    try:
        import jax
        return jax.process_count()
    except Exception:                              # pragma: no cover
        return 1


class UniPipeline:
    def __init__(self, **kwargs: Any):
        self._default: Dict[str, Any] = {
            "snapshot_steps": 5000,
            "test_batch_size": 1,
            "effective_batch_size": 8,
            "data": "Unknown",
            "net": "Unknown",
            "expid": "Unknown",
            "log_step": 100,
            "test_split": "test",
            "num_workers": 8,
            "base_lr": 0.1,
            "max_iter": 10,
            "random_seed": 88,
            "train_crop_size": 224,
            "test_crop_size": 224,
            "train_shuffle": True,
            "weight_decay": 1e-4,
            "scheduler_type": "linear",
            "warmup_steps": 0,
            "max_gen_length": 20,
            "crop_pct": 1.0,
            "force_train": False,
            "force_predict": False,
            "ignore_predict": False,
            "ignore_evaluate": False,
            "test_max_iter": None,
            "data_root": None,
            "output_root": "output",
            "basemodel": None,
            "train_label_version": None,
            "monitor_after": False,
        }
        self.kwargs = kwargs
        self.cfg = Config(self._default, kwargs)
        self.full_expid = kwargs.get("full_expid") or "_".join(
            [self.cfg.data, self.cfg.net, self.cfg.expid])
        self.output_folder = op.join(self.cfg.output_root, self.full_expid)
        self.model_folder = op.join(self.output_folder, "snapshot")
        self.mpi_rank = get_mpi_rank()
        self.mpi_size = get_mpi_size()
        self._max_iter: Optional[int] = None
        self.initialized = False

    # ------------------------------------------------------------------
    # config / naming
    # ------------------------------------------------------------------

    @property
    def max_iter(self) -> int:
        if self._max_iter is None:
            self._max_iter = self.parse_iter(self.cfg.max_iter)
        return self._max_iter

    def parse_iter(self, i) -> int:
        """'30e' -> iterations from epochs (reference uni_pipeline.py:253)."""
        if isinstance(i, str) and i.endswith("e"):
            n = len(self.get_len_dataset(is_train=True))
            iter_each_epoch = n / self.cfg.effective_batch_size
            return int(float(i[:-1]) * iter_each_epoch)
        return int(i)

    def get_checkpoint_file(self, iteration: Optional[int] = None) -> str:
        if iteration is None:
            iteration = self.max_iter
        suffix = ".orbax" if self.cfg.get("checkpoint_backend") == "orbax" \
            else ".ckpt"
        path = op.join(self.model_folder,
                       f"model_iter_{iteration:07d}{suffix}")
        if not op.exists(path):
            # reference-workflow interop: a released torch checkpoint
            # dropped into the snapshot dir as model_iter_*.pt evaluates
            # through the bridge (the reference checkpointer's native
            # format, checkpoint.py's fuzzy .pt load; see PARITY_RUNBOOK.md)
            pt = op.join(self.model_folder, f"model_iter_{iteration:07d}.pt")
            if op.exists(pt):
                return pt
        return path

    def append_predict_param(self, cc: list) -> None:
        if self.cfg.test_max_iter is not None:      # speed-test predicate
            cc.append(f"max_iter{self.cfg.test_max_iter}")
            cc.append(f"BS{self.cfg.test_batch_size}")
        if self.cfg.max_gen_length != 20:
            cc.append(f"max_token{self.cfg.max_gen_length}")
        if self.cfg.test_crop_size and self.cfg.test_crop_size != 224:
            cc.append(f"crop{self.cfg.test_crop_size}")

    def get_predict_file(self, model_file: Optional[str] = None) -> str:
        if model_file is None:
            model_file = self.get_checkpoint_file()
        cc = [model_file, self.cfg.test_data, self.cfg.test_split]
        self.append_predict_param(cc)
        cc += ["predict", "tsv"]
        return ".".join(cc)

    def get_evaluate_file(self, predict_file: Optional[str] = None) -> str:
        if predict_file is None:
            predict_file = self.get_predict_file()
        assert predict_file.endswith(".tsv")
        return op.splitext(predict_file)[0] + ".report"

    def is_train_finished(self) -> bool:
        # orbax checkpoints are directories, msgpack are files
        return op.exists(self.get_checkpoint_file())

    # ------------------------------------------------------------------
    # factories (subclass hooks)
    # ------------------------------------------------------------------

    def get_len_dataset(self, is_train: bool):
        raise NotImplementedError

    def get_transform(self, is_train: bool):
        raise NotImplementedError

    def get_dataset(self, is_train: bool):
        return DatasetPlusTransform(self.get_len_dataset(is_train),
                                    self.get_transform(is_train))

    def get_data_loader(self, is_train: bool, start_iter: int = 0,
                        dataset=None):
        if dataset is None:
            dataset = self.get_dataset(is_train)
        per_rank = (self.cfg.effective_batch_size // self.mpi_size
                    if is_train else self.cfg.test_batch_size)
        if self.cfg.get("loader") == "grain":
            from ..data.grain_loader import GrainDataLoader
            return GrainDataLoader(
                dataset, per_rank,
                shuffle=is_train and bool(self.cfg.train_shuffle),
                seed=int(self.cfg.get("seed") or self.cfg.random_seed or 0),
                infinite=is_train,
                max_iter=self.max_iter if is_train else None,
                start_iter=start_iter,
                shard_index=self.mpi_rank, shard_count=self.mpi_size,
                num_workers=int(self.cfg.get("grain_workers") or 0))
        if is_train:
            sampler = DistributedSampler(dataset, self.mpi_size,
                                         self.mpi_rank,
                                         shuffle=self.cfg.train_shuffle)
            bs = BatchSampler(sampler, per_rank, drop_last=True)
            ibs = IterationBasedBatchSampler(bs, self.max_iter, start_iter)
            return DataLoader(dataset, ibs,
                              num_workers=self.cfg.num_workers)
        sampler = DistributedSampler(dataset, self.mpi_size, self.mpi_rank,
                                     shuffle=False)
        bs = BatchSampler(sampler, self.cfg.test_batch_size, drop_last=False)
        return DataLoader(dataset, bs, num_workers=self.cfg.num_workers)

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def _ensure_initialized(self) -> None:
        if self.initialized:
            return
        from ..parallel.distributed import ensure_init_distributed
        from ..utils.common import enable_compilation_cache
        ensure_init_distributed()
        enable_compilation_cache()
        self.mpi_rank = get_mpi_rank()
        self.mpi_size = get_mpi_size()
        ensure_directory(self.output_folder)
        ensure_directory(self.model_folder)
        init_logging(self.mpi_rank, self.output_folder)
        np.random.seed(self.cfg.random_seed)
        self.initialized = True

    def ensure_train(self):
        self._ensure_initialized()
        last = self.get_checkpoint_file()
        if op.exists(last) and not self.cfg.force_train:
            logging.info("skip to train: %s exists", last)
            return
        if self.mpi_rank == 0:
            save_parameters(self.kwargs, self.output_folder)
        out = self.train()
        # all ranks leave training only after rank 0's final snapshot is
        # on the shared FS (reference synchronize at uni_pipeline.py:369
        # vicinity): without this a fast peer reaches ensure_predict
        # before model_final exists and silently skips predicting,
        # desyncing the predict-merge barriers
        self._barrier()
        return out

    def train(self):
        raise NotImplementedError

    def ensure_predict(self, model_file: Optional[str] = None) -> str:
        if self.cfg.ignore_predict:
            return ""
        self._ensure_initialized()
        if model_file is None:
            model_file = self.get_checkpoint_file()
        predict_file = self.get_predict_file(model_file)
        if not op.exists(model_file):
            logging.info("no model file %s; skip predict", model_file)
            return predict_file
        if not worth_create(model_file, predict_file) \
                and not self.cfg.force_predict:
            logging.info("cached: %s", predict_file)
            return predict_file
        self.predict(model_file, predict_file)
        return predict_file

    def get_rank_specific_tsv(self, f: str, rank: int) -> str:
        return f"{f}_{rank}_{self.mpi_size}.tsv"

    def predict(self, model_file: str, predict_file: str) -> str:
        sub_file = predict_file if self.mpi_size == 1 else \
            self.get_rank_specific_tsv(predict_file, self.mpi_rank)
        model = self.load_test_model(model_file)
        dataset = self.get_dataset(is_train=False)
        loader = self.get_data_loader(is_train=False, dataset=dataset)
        meters = MetricLogger()
        profile_dir = self.cfg.get("jax_profile_dir")
        if profile_dir:                           # capture a device trace
            import jax
            with jax.profiler.trace(profile_dir):
                tsv_writer(self.predict_iter(loader, model, meters),
                           sub_file)
        else:
            tsv_writer(self.predict_iter(loader, model, meters), sub_file)
        logging.info(str(meters))
        # per-prediction speed report (reference .speed.yaml,
        # uni_pipeline.py:804-805); `module_time` carries the per-stage
        # device table when the pipeline measured one (`speed_breakdown`)
        speed = meters.get_info()
        if getattr(self, "speed_info", None):
            speed["module_time"] = self.speed_info
        write_to_yaml_file(speed, sub_file + ".speed.yaml")
        if self.mpi_rank == 0:
            write_to_yaml_file(self.kwargs, predict_file + ".info.yaml")
        self._barrier()
        if self.mpi_size > 1 and self.mpi_rank == 0:
            shards = [self.get_rank_specific_tsv(predict_file, i)
                      for i in range(self.mpi_size)]
            before = predict_file + ".before.reorder.tsv"
            concat_tsv_files(shards, before)
            # the distributed sampler duplicates the tail: dedup + restore
            # dataset key order (reference uni_pipeline.py:816-831)
            reorder_tsv_keys(before, dataset.get_keys(), predict_file)
            delete_tsv_files(shards + [before])
        self._barrier()
        return predict_file

    def _barrier(self) -> None:
        from ..parallel.distributed import barrier
        barrier("vitcap_pipeline")

    def load_test_model(self, model_file: str):
        raise NotImplementedError

    def predict_iter(self, dataloader, model, meters) -> Iterator:
        raise NotImplementedError

    def ensure_evaluate(self, predict_file: Optional[str] = None
                        ) -> Optional[Dict[str, float]]:
        if self.mpi_rank != 0:
            return None
        if self.cfg.ignore_evaluate or self.cfg.ignore_predict:
            return None
        self._ensure_initialized()
        if predict_file is None:
            predict_file = self.get_predict_file()
        evaluate_file = self.get_evaluate_file(predict_file)
        if not worth_create(predict_file, evaluate_file) \
                and not self.cfg.force_predict:
            logging.info("cached: %s", evaluate_file)
            with open(evaluate_file) as f:
                return json.load(f)
        return self.evaluate(predict_file, evaluate_file)

    def evaluate(self, predict_file: str, evaluate_file: str):
        raise NotImplementedError

    # ------------------------------------------------------------------
    # monitor: evaluate every intermediate checkpoint
    # ------------------------------------------------------------------

    def intermediate_checkpoints(self):
        import glob
        pat = op.join(self.model_folder, "model_iter_*.ckpt")
        final = self.get_checkpoint_file()
        for f in sorted(glob.glob(pat)):
            if f != final:
                yield f

    def monitor_train(self) -> None:
        """predict+evaluate each intermediate snapshot, then plot
        metric-vs-iteration PNGs and export TensorBoard scalars
        (reference uni_pipeline.py:1021-1079, plot_to_file common.py:449)."""
        self._ensure_initialized()
        by_iter: Dict[int, Dict[str, float]] = {}
        for ckpt in self.intermediate_checkpoints():
            pf = self.ensure_predict(model_file=ckpt)
            if pf and op.isfile(pf):
                rep = self.ensure_evaluate(pf)
                if rep:
                    it = int(op.basename(ckpt).split("_")[-1]
                             .split(".")[0])
                    by_iter[it] = rep
        if self.mpi_rank == 0 and by_iter:
            self._plot_and_tensorboard(by_iter)

    def _plot_and_tensorboard(self, by_iter: Dict[int, Dict[str, float]]
                              ) -> None:
        iters = sorted(by_iter)
        metrics = sorted({k for r in by_iter.values() for k in r
                          if isinstance(r[k], (int, float))})
        img_dir = op.join(self.output_folder, "images")
        ensure_directory(img_dir)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for m in metrics:
                xs = [i for i in iters if m in by_iter[i]]
                ys = [by_iter[i][m] for i in xs]
                fig, ax = plt.subplots()
                ax.plot(xs, ys, marker="o")
                ax.set_xlabel("iteration")
                ax.set_ylabel(m)
                ax.grid(True)
                fig.savefig(op.join(
                    img_dir,
                    f"map_{self.cfg.test_data}_{self.cfg.test_split}_{m}.png"))
                plt.close(fig)
        except Exception as e:                     # pragma: no cover
            logging.info("plotting unavailable: %s", e)
        try:
            from torch.utils.tensorboard import SummaryWriter
            with SummaryWriter(op.join(self.output_folder,
                                       "tensorboard")) as w:
                for i in iters:
                    for m, v in by_iter[i].items():
                        if isinstance(v, (int, float)):
                            w.add_scalar(m, v, i)
        except Exception as e:                     # pragma: no cover
            logging.info("tensorboard unavailable: %s", e)
