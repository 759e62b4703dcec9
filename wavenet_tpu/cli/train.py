"""Training CLI — flag surface mirrors the reference's train.py.

Reference: train.py ≈:40-140 (get_arguments), ≈:175-205
(validate_directories logdir/logdir_root/restore_from rules), ≈:210-320
(main loop). Differences: the step is one jit'd XLA program (train_lib),
checkpoints are orbax directories, profiling uses jax.profiler traces
(viewable in TensorBoard/Perfetto) instead of TF Chrome timelines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime

import jax
import numpy as np

BATCH_SIZE = 1
DATA_DIRECTORY = "./VCTK-Corpus"
LOGDIR_ROOT = "./logdir"
CHECKPOINT_EVERY = 50
NUM_STEPS = int(1e5)
LEARNING_RATE = 1e-3
WAVENET_PARAMS = "./wavenet_params.json"
STARTED_DATESTRING = "{0:%Y-%m-%dT%H-%M-%S}".format(datetime.now())
SAMPLE_SIZE = 100000
L2_REGULARIZATION_STRENGTH = 0
SILENCE_THRESHOLD = 0.3
EPSILON = 0.001
MOMENTUM = 0.9
MAX_TO_KEEP = 5


def get_arguments(argv=None):
    def _str_to_bool(s):
        if s.lower() not in ("true", "false"):
            raise ValueError("Argument needs to be a boolean, got {}".format(s))
        return s.lower() == "true"

    parser = argparse.ArgumentParser(description="WaveNet training (TPU-native)")
    parser.add_argument("--batch_size", type=int, default=BATCH_SIZE)
    parser.add_argument("--data_dir", type=str, default=DATA_DIRECTORY)
    parser.add_argument("--store_metadata", type=_str_to_bool, default=False,
                        help="Record profiler traces every 50 steps. "
                             "(The reference's argparse type=bool makes "
                             "'--store_metadata False' truthy; fixed here.)")
    parser.add_argument("--logdir", type=str, default=None)
    parser.add_argument("--logdir_root", type=str, default=None)
    parser.add_argument("--restore_from", type=str, default=None)
    parser.add_argument("--checkpoint_every", type=int, default=CHECKPOINT_EVERY)
    parser.add_argument("--num_steps", type=int, default=NUM_STEPS)
    parser.add_argument("--learning_rate", type=float, default=LEARNING_RATE)
    parser.add_argument("--wavenet_params", type=str, default=WAVENET_PARAMS)
    parser.add_argument("--sample_size", type=int, default=SAMPLE_SIZE)
    parser.add_argument("--l2_regularization_strength", type=float,
                        default=L2_REGULARIZATION_STRENGTH)
    parser.add_argument("--silence_threshold", type=float,
                        default=SILENCE_THRESHOLD)
    parser.add_argument("--optimizer", type=str, default="adam",
                        choices=["adam", "sgd", "rmsprop"])
    parser.add_argument("--momentum", type=float, default=MOMENTUM)
    parser.add_argument("--histograms", type=_str_to_bool, default=False)
    parser.add_argument("--gc_channels", type=int, default=None,
                        help="Global condition channels; enables speaker "
                             "conditioning.")
    parser.add_argument("--lc_channels", type=int, default=None,
                        help="Local condition channels (extension; the "
                             "reference has GC only): enables per-timestep "
                             "conditioning from <stem>.lc.npy sidecar "
                             "files ([frames, lc_channels]) next to each "
                             "wav.")
    parser.add_argument("--lc_hop", type=int, default=None,
                        help="Output samples per LC frame (at the model "
                             "sample_rate). Required with --lc_channels.")
    parser.add_argument("--lc_upsample", type=str, default="repeat",
                        choices=["repeat", "linear"],
                        help="How LC frames are upsampled to sample rate.")
    parser.add_argument("--lc_host_upsample", action="store_true",
                        help="Ship the fully upsampled LC stream to the "
                             "device instead of frame windows (the "
                             "pre-round-3 behavior; ~300x the transfer "
                             "bytes — debugging escape hatch only).")
    parser.add_argument("--lc_refine_width", type=int, default=0,
                        help="Learned LC upsampling (paper §2.5 learned "
                             "mapping): odd depthwise-conv width of the "
                             "trainable refinement over the upsampled "
                             "stream (try 2*lc_hop+1). 0 disables.")
    parser.add_argument("--max_checkpoints", type=int, default=MAX_TO_KEEP)
    parser.add_argument("--num_threads", type=int, default=1,
                        help="Reader worker threads (decode/trim/window "
                             "in parallel; each gets an independent "
                             "with-replacement file stream).")
    parser.add_argument("--model_parallelism", type=int, default=1,
                        help="Chips per model replica (TPU-native extension; "
                             "remaining chips go data-parallel).")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 for multi-host "
                             "training (or set JAX_COORDINATOR_ADDRESS; "
                             "auto-detected on Cloud TPU pods).")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize layers in backward (less "
                             "activation memory, ~30%% more FLOPs).")
    parser.add_argument("--use_pallas_stack", action="store_true",
                        help="Run the dilated stack through the fused "
                             "Pallas training kernel.")
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--compilation_cache", type=str,
                        default="~/.cache/wavenet_tpu_xla",
                        help="Persistent XLA compilation cache dir "
                             "('' disables). Makes restarts skip the "
                             "first-step compile.")
    return parser.parse_args(argv)


def enable_compilation_cache(path: str) -> None:
    if not path:
        return
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def get_default_logdir(logdir_root):
    return os.path.join(logdir_root, "train", STARTED_DATESTRING)


def validate_directories(args):
    """The reference's logdir mutual-exclusion rules (train.py ≈:175-205)."""
    if args.logdir and args.logdir_root:
        raise ValueError("--logdir and --logdir_root cannot be specified "
                         "at the same time.")
    if args.logdir and args.restore_from:
        raise ValueError(
            "--logdir and --restore_from cannot be specified at the same "
            "time. This is to keep your previous model from unexpected "
            "overwrites.\n"
            "Use --logdir_root to specify the root of the directory which "
            "will be automatically created with current date and time, or "
            "use only --logdir to just continue the training from the "
            "model in the directory.")

    logdir = args.logdir
    logdir_root = args.logdir_root
    if logdir_root is None:
        logdir_root = LOGDIR_ROOT
    if logdir is None:
        logdir = get_default_logdir(logdir_root)
        print(f"Using default logdir: {logdir}")
    restore_from = args.restore_from
    if restore_from is None:
        # args.logdir mode: restore from logdir itself (continue training).
        restore_from = logdir
    return {
        "logdir": logdir,
        "logdir_root": logdir_root,
        "restore_from": restore_from,
    }


def main(argv=None):
    args = get_arguments(argv)
    try:
        directories = validate_directories(args)
    except ValueError as e:
        print(f"Some arguments are wrong:\n{e}")
        return 1

    enable_compilation_cache(args.compilation_cache)

    logdir = directories["logdir"]
    restore_from = directories["restore_from"]
    # Even when we restored from another directory, training overwrites
    # checkpoints into logdir (the reference's is_overwritten_training flag).
    is_overwritten_training = logdir != restore_from

    from wavenet_tpu.data.reader import AudioReader
    from wavenet_tpu.models.config import WaveNetConfig
    from wavenet_tpu.models.wavenet import init_params
    from wavenet_tpu.parallel.distributed import (
        global_batch_from_local, initialize_multihost, make_global_mesh)
    from wavenet_tpu.parallel.sharding import (
        make_mesh, shard_batch, shard_train_state)

    multihost = initialize_multihost(args.coordinator_address,
                                     args.num_processes, args.process_id)
    if multihost:
        print(f"Multi-host: process {jax.process_index()} of "
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    from wavenet_tpu.train_lib import (
        StepTimer, audio_seconds_per_second, create_train_state,
        make_optimizer, make_train_step, restore_checkpoint, save_checkpoint)
    from wavenet_tpu.utils.summaries import SummaryWriter

    with open(args.wavenet_params, "r") as f:
        wavenet_params = json.load(f)

    gc_enabled = args.gc_channels is not None
    lc_enabled = args.lc_channels is not None
    if lc_enabled and args.lc_hop is None:
        print("Some arguments are wrong:\n--lc_channels requires --lc_hop "
              "(output samples per conditioning frame).")
        return 1

    receptive_field_probe = WaveNetConfig.from_json(wavenet_params)
    reader = AudioReader(
        args.data_dir,
        sample_rate=wavenet_params["sample_rate"],
        gc_enabled=gc_enabled,
        receptive_field=receptive_field_probe.receptive_field,
        sample_size=args.sample_size,
        silence_threshold=(args.silence_threshold
                           if args.silence_threshold > 0 else None),
        # Disjoint per-host streams under a fixed seed (sampling with
        # replacement makes any per-process offset valid).
        seed=(args.seed + jax.process_index()
              if args.seed is not None else None),
        lc_enabled=lc_enabled,
        lc_channels=args.lc_channels,
        lc_hop=args.lc_hop,
        lc_upsample=args.lc_upsample,
        lc_device_upsample=lc_enabled and not args.lc_host_upsample,
        num_threads=args.num_threads,
    )

    config = WaveNetConfig.from_json(
        wavenet_params,
        gc_channels=args.gc_channels,
        gc_cardinality=reader.gc_category_cardinality if gc_enabled else None,
        lc_channels=args.lc_channels,
        lc_refine_width=args.lc_refine_width,
        compute_dtype=args.compute_dtype,
        remat=args.remat,
        use_pallas_stack=args.use_pallas_stack,
    )

    if args.l2_regularization_strength == 0:
        args.l2_regularization_strength = None

    optimizer = make_optimizer(args.optimizer, args.learning_rate,
                               args.momentum)
    key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
    state = create_train_state(key, config, optimizer)

    restored = restore_checkpoint(restore_from, state)
    if restored is not None:
        state = restored
        print(f"Restored model from step {int(jax.device_get(state.step))}")
    else:
        print("No checkpoint found; starting new training.")

    if multihost:
        mesh = make_global_mesh(model_parallelism=args.model_parallelism)
    else:
        mesh = make_mesh(model_parallelism=args.model_parallelism)
    state = shard_train_state(state, config, mesh)

    train_step = make_train_step(config, optimizer,
                                 args.l2_regularization_strength,
                                 lc_hop=args.lc_hop,
                                 lc_upsample=args.lc_upsample)

    os.makedirs(logdir, exist_ok=True)
    writer = SummaryWriter(logdir)
    reader.start_threads()

    saved_global_step = int(jax.device_get(state.step))
    last_saved_step = saved_global_step
    timer = StepTimer()
    step = saved_global_step
    poisoned = False
    # Loss readback LAGS one step: jax dispatch is async, so fetching
    # step N-1's scalar while step N executes on device hides the
    # device-roundtrip latency (10-25 ms through a tunneled chip)
    # behind compute. Checkpoint steps validate synchronously so a
    # poisoned (non-finite) state is never saved — same guarantee as
    # the round-2 NaN fix, one step later at worst for the print.
    pending = None  # (step, metrics, batch_samples)

    def handle(item):
        """Print/log one step's fetched metrics; True if non-finite."""
        s, metrics, n_samples = item
        loss_value = float(jax.device_get(metrics["loss"]))
        if not np.isfinite(loss_value):
            # The update for this step has already been applied, so the
            # in-memory state is poisoned — stop WITHOUT saving it (the
            # newest on-disk checkpoint stays the last finite one; the
            # reference would silently continue training on NaNs).
            print(f"step {s} - NON-FINITE loss ({loss_value}); "
                  "stopping without saving the poisoned state.")
            return True
        duration = timer.lap()
        aps = audio_seconds_per_second(
            n_samples, wavenet_params["sample_rate"], duration)
        print(f"step {s} - loss = {loss_value:.3f}, "
              f"({duration:.3f} sec/step, {aps:.2f} audio-sec/s)")
        writer.scalar("loss", loss_value, s)
        writer.scalar("sec_per_step", duration, s)
        if "l2_loss" in metrics:
            writer.scalar("l2_loss",
                          float(jax.device_get(metrics["l2_loss"])), s)
        return False

    try:
        for step in range(saved_global_step + 1, args.num_steps + 1):
            # batch_size is per host (reference semantics on one host);
            # each process feeds its own disjoint stream.
            audio = reader.dequeue(args.batch_size)
            gc_ids = reader.dequeue_gc(args.batch_size) if gc_enabled else None
            lc = reader.dequeue_lc(args.batch_size) if lc_enabled else None
            if multihost:
                audio, gc_ids, lc = global_batch_from_local(
                    audio, mesh, gc_ids, lc)
            else:
                audio, gc_ids, lc = shard_batch(audio, mesh, gc_ids, lc)

            if args.store_metadata and step % 50 == 0:
                with jax.profiler.trace(os.path.join(logdir, "profile")):
                    state, metrics = train_step(state, audio, gc_ids, lc)
                    jax.block_until_ready(metrics)
            else:
                state, metrics = train_step(state, audio, gc_ids, lc)
            n_samples = audio.shape[0] * audio.shape[1]

            if pending is not None:
                poisoned = handle(pending)
                pending = None
                if poisoned:
                    break

            if args.histograms and step % 50 == 0:
                for k, v in state.params.items():
                    writer.histogram(f"params/{k}",
                                     np.asarray(jax.device_get(v)), step)

            if step % args.checkpoint_every == 0 or step == args.num_steps:
                poisoned = handle((step, metrics, n_samples))
                if poisoned:
                    break
                save_checkpoint(logdir, state, args.max_checkpoints)
                last_saved_step = step
            else:
                pending = (step, metrics, n_samples)
    except KeyboardInterrupt:
        print()
        pending = None
    finally:
        if pending is not None and not poisoned:
            poisoned = handle(pending)
        if step > last_saved_step and not poisoned:
            save_checkpoint(logdir, state, args.max_checkpoints)
        reader.stop_threads()
        writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
