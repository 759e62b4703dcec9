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
    parser.add_argument("--async_checkpoint", type=_str_to_bool,
                        default=True,
                        help="Write checkpoints in a background thread "
                             "(state is snapshotted to host first, so "
                             "training resumes immediately; a kill "
                             "mid-save leaves the previous checkpoint "
                             "intact — orbax finalizes by rename).")
    parser.add_argument("--num_threads", type=int, default=1,
                        help="Reader worker threads (decode/trim/window "
                             "in parallel; each gets an independent "
                             "with-replacement file stream).")
    parser.add_argument("--prefetch_depth", type=int, default=2,
                        help="Device-resident input batches staged ahead "
                             "of the step by a background thread (the "
                             "host->device transfer overlaps compute). "
                             "0 disables (pre-round-4 inline transfers).")
    parser.add_argument("--steps_per_dispatch", type=int, default=4,
                        help="Train steps fused into one compiled "
                             "lax.scan program per device dispatch; "
                             "amortizes the per-dispatch host round-trip "
                             "(measured 50 -> 16 ms/step through the "
                             "tunneled chip at b8/16k bf16). Loss is "
                             "still printed/logged per step, checkpoints "
                             "land on dispatch boundaries, --num_steps "
                             "is exact (a < K remainder runs single "
                             "steps). 1 restores one-dispatch-per-step.")
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

    dispatch_k = max(1, args.steps_per_dispatch)
    if multihost and dispatch_k > 1:
        print("--steps_per_dispatch > 1 is single-host only for now; "
              "using 1.")
        dispatch_k = 1
    from wavenet_tpu.train_lib import make_train_multistep
    if dispatch_k > 1:
        train_step = make_train_multistep(
            config, optimizer, args.l2_regularization_strength,
            lc_hop=args.lc_hop, lc_upsample=args.lc_upsample,
            steps_per_dispatch=dispatch_k)
    else:
        train_step = make_train_step(config, optimizer,
                                     args.l2_regularization_strength,
                                     lc_hop=args.lc_hop,
                                     lc_upsample=args.lc_upsample)

    os.makedirs(logdir, exist_ok=True)
    writer = SummaryWriter(logdir)
    reader.start_threads()

    def dequeue_host_batch(k, stacked):
        """k training batches from the reader, stacked when ``stacked``."""
        auds, gcs, lcs = [], [], []
        for _ in range(k):
            auds.append(reader.dequeue(args.batch_size))
            if gc_enabled:
                gcs.append(reader.dequeue_gc(args.batch_size))
            if lc_enabled:
                lcs.append(reader.dequeue_lc(args.batch_size))
        if not stacked:
            return (auds[0], gcs[0] if gc_enabled else None,
                    lcs[0] if lc_enabled else None)
        audio = np.stack(auds)
        gc_ids = np.stack(gcs) if gc_enabled else None
        lc = (jax.tree.map(lambda *xs: np.stack(xs), *lcs)
              if lc_enabled else None)
        return audio, gc_ids, lc

    def fill(k=dispatch_k, stacked=dispatch_k > 1):
        """One device-resident dispatch input (runs in the prefetch
        thread: the host->device transfer overlaps the running step)."""
        audio, gc_ids, lc = dequeue_host_batch(k, stacked)
        if multihost:
            audio, gc_ids, lc = global_batch_from_local(
                audio, mesh, gc_ids, lc)
        else:
            audio, gc_ids, lc = shard_batch(audio, mesh, gc_ids, lc,
                                            stacked=stacked)
        n_samples = int(np.prod(audio.shape[-2:]))  # per train step
        return audio, gc_ids, lc, n_samples

    saved_global_step = int(jax.device_get(state.step))
    prefetcher = None
    # Exactly this many full k-step dispatches will run; bound the
    # worker to that count so it never consumes reader batches that
    # belong to the inline remainder steps (a worker mid-fill at stop()
    # time would otherwise steal them nondeterministically).
    n_dispatches = max(0, args.num_steps - saved_global_step) // dispatch_k
    if args.prefetch_depth > 0 and n_dispatches > 0:
        from wavenet_tpu.data.prefetch import DevicePrefetcher
        prefetcher = DevicePrefetcher(fill, depth=args.prefetch_depth,
                                      max_items=n_dispatches)
    last_saved_step = saved_global_step
    timer = StepTimer()
    step = saved_global_step
    poisoned = False
    # Loss readback LAGS one dispatch: jax dispatch is async, so fetching
    # dispatch N-1's scalars while dispatch N executes on device hides the
    # device-roundtrip latency (10-25 ms through a tunneled chip)
    # behind compute. Checkpoint dispatches validate synchronously so a
    # poisoned (non-finite) state is never saved — same guarantee as
    # the round-2 NaN fix, one dispatch later at worst for the print.
    pending = None  # (first_step, metrics, samples_per_step)

    def handle(item):
        """Print/log one dispatch's fetched metrics; True if non-finite.

        ``metrics`` leaves are scalars (k=1) or ``[k]``-stacked; either
        way one line per TRAIN STEP is printed/logged (reference
        train.py ≈:305 prints per step).
        """
        s0, metrics, n_samples = item
        metrics = jax.device_get(metrics)
        losses = np.asarray(metrics["loss"]).reshape(-1)
        l2s = (np.asarray(metrics["l2_loss"]).reshape(-1)
               if "l2_loss" in metrics else None)
        duration = timer.lap() / len(losses)
        for i, loss_value in enumerate(losses):
            s = s0 + i
            loss_value = float(loss_value)
            if not np.isfinite(loss_value):
                # The update for this step has already been applied, so
                # the in-memory state is poisoned — stop WITHOUT saving
                # it (the newest on-disk checkpoint stays the last
                # finite one; the reference would silently continue
                # training on NaNs).
                print(f"step {s} - NON-FINITE loss ({loss_value}); "
                      "stopping without saving the poisoned state.")
                return True
            aps = audio_seconds_per_second(
                n_samples, wavenet_params["sample_rate"], duration)
            print(f"step {s} - loss = {loss_value:.3f}, "
                  f"({duration:.3f} sec/step, {aps:.2f} audio-sec/s)")
            writer.scalar("loss", loss_value, s)
            writer.scalar("sec_per_step", duration, s)
            if l2s is not None:
                writer.scalar("l2_loss", float(l2s[i]), s)
        return False

    def crosses(step_start, step_end, every):
        """Does [step_start, step_end] contain a multiple of ``every``?"""
        return step_end // every > (step_start - 1) // every

    single_step = train_step if dispatch_k == 1 else None
    try:
        while step < args.num_steps:
            first = step + 1
            if step + dispatch_k > args.num_steps:
                # Remainder (< steps_per_dispatch steps left): fall back
                # to inline single-step dispatches so --num_steps is hit
                # exactly (one extra compile, once, at the very end).
                if prefetcher is not None:
                    prefetcher.stop()
                    prefetcher = None
                if single_step is None:
                    single_step = make_train_step(
                        config, optimizer,
                        args.l2_regularization_strength,
                        lc_hop=args.lc_hop,
                        lc_upsample=args.lc_upsample)
                audio, gc_ids, lc, n_samples = fill(k=1, stacked=False)
                state, metrics = single_step(state, audio, gc_ids, lc)
                k = 1
            else:
                audio, gc_ids, lc, n_samples = (
                    prefetcher.get() if prefetcher is not None else fill())
                profiled = (args.store_metadata
                            and crosses(first, step + dispatch_k, 50))
                if profiled:
                    with jax.profiler.trace(
                            os.path.join(logdir, "profile")):
                        state, metrics = train_step(state, audio,
                                                    gc_ids, lc)
                        jax.block_until_ready(metrics)
                else:
                    state, metrics = train_step(state, audio, gc_ids, lc)
                k = dispatch_k
            step += k

            if pending is not None:
                poisoned = handle(pending)
                pending = None
                if poisoned:
                    break

            if args.histograms and crosses(first, step, 50):
                for name, v in state.params.items():
                    writer.histogram(f"params/{name}",
                                     np.asarray(jax.device_get(v)), step)

            if (crosses(first, step, args.checkpoint_every)
                    or step == args.num_steps):
                poisoned = handle((first, metrics, n_samples))
                if poisoned:
                    break
                save_checkpoint(logdir, state, args.max_checkpoints,
                                use_async=args.async_checkpoint)
                last_saved_step = step
            else:
                pending = (first, metrics, n_samples)
    except KeyboardInterrupt:
        print()
        pending = None
    finally:
        if prefetcher is not None:
            prefetcher.stop()
        if pending is not None and not poisoned:
            poisoned = handle(pending)
        if step > last_saved_step and not poisoned:
            save_checkpoint(logdir, state, args.max_checkpoints,
                            use_async=args.async_checkpoint)
        from wavenet_tpu.train_lib import wait_for_checkpoints
        wait_for_checkpoints()
        reader.stop_threads()
        writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
