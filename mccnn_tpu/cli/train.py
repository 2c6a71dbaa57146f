"""Training CLI — flag-compatible with the reference's train.py.

Reference contract (reference: src/train.py:13-33): ``--list_dir`` holding
train.txt/val.txt, checkpoint/metrics dirs, resume path, epoch range and
print/save/val frequencies, plus the paper's hyperparameter defaults. Runs
the jitted hinge-loss train step (data-parallel over all local devices with
``--data_parallel``); metrics go to JSONL instead of TensorBoard.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from mccnn_tpu.data.dataset import StereoDataset
from mccnn_tpu.data.sampler import TripletSampler
from mccnn_tpu.models.net import init_params
from mccnn_tpu.models.params import load_any
from mccnn_tpu.parallel.mesh import make_mesh
from mccnn_tpu.parallel.train import make_dp_train_step, shard_batch
from mccnn_tpu.pipeline.train import make_eval_step, make_optimizer, make_train_step
from mccnn_tpu.utils.checkpoint import (
    epoch_of,
    load_checkpoint,
    save_checkpoint,
)
from mccnn_tpu.utils.config import TrainConfig
from mccnn_tpu.utils.metrics import MetricsLogger


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="training of MC-CNN (TPU-native)",
    )
    parser.add_argument("-g", "--gpu", type=str, default="0",
                        help="accepted for reference compatibility; device "
                             "selection is automatic under JAX")
    parser.add_argument("-ps", "--patch_size", type=int, default=11)
    parser.add_argument("-bs", "--batch_size", type=int, default=128)
    parser.add_argument("-mr", "--margin", type=float, default=0.2)
    parser.add_argument("-lr", "--learning_rate", type=float, default=0.002)
    parser.add_argument("-bt", "--beta", type=float, default=0.9)
    parser.add_argument("--list_dir", type=str, required=True)
    parser.add_argument("--tensorboard_dir", type=str, required=True,
                        help="metrics dir (JSONL instead of TF summaries)")
    parser.add_argument("--checkpoint_dir", type=str, required=True)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--end_epoch", type=int, default=14)
    parser.add_argument("--print_freq", type=int, default=10)
    parser.add_argument("--save_freq", type=int, default=1)
    parser.add_argument("--val_freq", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard the batch over all local devices")
    parser.add_argument("--sampler_backend", type=str, default="numpy",
                        choices=["numpy", "native", "auto"],
                        help="host patch-sampler implementation (native = "
                             "the C++ sampler in native/)")
    parser.add_argument("--prefetch_batches", type=int, default=2,
                        help="overlap host sampling with device steps via a "
                             "background thread holding up to N batches "
                             "(bit-identical sample stream; 0 = synchronous)")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    config = TrainConfig(
        batch_size=args.batch_size,
        margin=args.margin,
        learning_rate=args.learning_rate,
        beta=args.beta,
        start_epoch=args.start_epoch,
        end_epoch=args.end_epoch,
        print_freq=args.print_freq,
        save_freq=args.save_freq,
        val_freq=args.val_freq,
    )

    train_set = StereoDataset(
        os.path.join(args.list_dir, "train.txt"), shuffle=True, seed=args.seed
    )
    val_set = StereoDataset(os.path.join(args.list_dir, "val.txt"))
    train_sampler = TripletSampler(
        train_set, patch_size=args.patch_size, seed=args.seed,
        dataset_pos=config.dataset_pos,
        dataset_neg_low=config.dataset_neg_low,
        dataset_neg_high=config.dataset_neg_high,
        backend=args.sampler_backend,
    )
    val_sampler = TripletSampler(
        val_set, patch_size=args.patch_size, seed=args.seed + 1,
        dataset_pos=config.dataset_pos,
        dataset_neg_low=config.dataset_neg_low,
        dataset_neg_high=config.dataset_neg_high,
        backend=args.sampler_backend,
    )

    params = init_params(jax.random.key(args.seed))
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)

    mesh = None
    if args.data_parallel:
        mesh = make_mesh()
        train_step = make_dp_train_step(config, mesh, optimizer=optimizer)
    else:
        train_step = make_train_step(config, optimizer)
    eval_step = make_eval_step(config)

    start_epoch = config.start_epoch
    if args.resume:
        if args.resume.endswith(".npz") and "model_epoch" in args.resume:
            template = {"params": params, "opt_state": opt_state}
            restored = load_checkpoint(args.resume, template)
            params, opt_state = restored["params"], restored["opt_state"]
            start_epoch = max(start_epoch, epoch_of(args.resume))
        else:  # reference npy-dict or TF checkpoint: params only
            params = load_any(args.resume)
            opt_state = optimizer.init(params)

    logger = MetricsLogger(
        os.path.join(args.tensorboard_dir, "metrics.jsonl"),
        tensorboard_dir=args.tensorboard_dir,
    )
    logger.log(event="start", train_pairs=len(train_set), val_pairs=len(val_set),
               devices=jax.device_count())

    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        tqdm = lambda x, **kw: x  # noqa: E731

    train_feed = train_sampler
    if args.prefetch_batches > 0 and config.end_epoch > start_epoch:
        from mccnn_tpu.data.prefetch import BatchPrefetcher

        train_feed = BatchPrefetcher(
            train_sampler, config.batch_size, epoch_len=len(train_set),
            depth=args.prefetch_batches,
        )

    for epoch in range(start_epoch, config.end_epoch):
        for batch_idx in tqdm(range(len(train_set)),
                              desc=f"epoch {epoch + 1}", leave=False):
            batch = train_feed.next_batch(config.batch_size)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            params, opt_state, loss = train_step(params, opt_state, batch)
            if (batch_idx + 1) % config.print_freq == 0:
                logger.log(step=epoch * len(train_set) + batch_idx,
                           event="train", epoch=epoch + 1, batch=batch_idx + 1,
                           hinge_loss=float(loss))

        if (epoch + 1) % config.save_freq == 0:
            path = save_checkpoint(args.checkpoint_dir, epoch + 1, params, opt_state)
            logger.log(event="checkpoint", epoch=epoch + 1, path=path)

        if (epoch + 1) % config.val_freq == 0:
            val_loss = 0.0
            for _ in tqdm(range(len(val_set)), desc="val", leave=False):
                batch = val_sampler.next_batch(config.batch_size)
                val_loss += float(eval_step(params, batch))
            val_loss /= max(1, len(val_set))
            logger.log(step=len(train_set) * (epoch + 1), event="val",
                       epoch=epoch + 1, val_hinge_loss=val_loss)

        train_feed.reset()  # the prefetcher forwards to the sampler
        val_sampler.reset()

    if train_feed is not train_sampler:
        train_feed.close()
    logger.close()


if __name__ == "__main__":
    main()
