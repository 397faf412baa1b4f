"""Host-side batching: deterministic, parallel example preparation.

Responsibility-parity with the reference's `parallel_preproc.py` (SURVEY.md
§3.3 "async input pipeline"): a worker pool runs the per-example host prep
(`prepare_example`) and batches stream to the device. Differences by design:

* Determinism is a contract, not an accident: every example's RNG is
  `np.random.default_rng((seed, epoch, example_index))`, so any batch is
  reproducible independently of worker scheduling or host count (SURVEY.md
  §5.5).
* Multi-host sharding: each host iterates only indices
  `host_id::host_count` of the shuffled epoch order.
* Workers are threads by default (cv2/libjpeg decode releases the GIL and
  this image has 1 CPU); `pool_type="process"` switches to a spawn-based
  ProcessPoolExecutor for real hosts, where `prepare_example`'s Python-level
  3x3 algebra (~0.9 ms/example, BASELINE.md) is GIL-bound and needs ~4.5
  cores/chip at the 5k target. Each worker process receives the dataset
  accessor ONCE (pool initializer), tasks ship only (index, rng key), and
  the (seed, epoch, idx) contract makes both pool types produce identical
  batches (tests/test_pipeline.py pins thread/process equivalence).
"""
from __future__ import annotations

import concurrent.futures as _futures
import multiprocessing
import os
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from metro_pose3d_tpu.config import AugConfig
from metro_pose3d_tpu.geom.joints import JointInfo
from metro_pose3d_tpu.pipeline.crops import Example, prepare_example, sample_aug_params


def stack_examples(prepared: Sequence[dict]) -> dict:
    """List of prepared-example dicts -> dict of batched arrays."""
    keys = prepared[0].keys()
    return {k: np.stack([p[k] for p in prepared]) for k in keys}


def prefetch(iterator: Iterator[dict], depth: int = 2) -> Iterator[dict]:
    """Run `iterator` in a background thread, keeping `depth` batches ready.

    Overlaps host-side example preparation with the device step (the
    reference gets this from tf.data's prefetch; here it is one daemon
    thread and a bounded queue). Exceptions re-raise at the consumer.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 — surfaced to the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def prepare_one(
    example: Example,
    joint_info: JointInfo,
    proc_side: int,
    tile_side: int,
    aug_cfg: Optional[AugConfig],
    rng_key: tuple,
    n_occluders: int,
    box_expansion: float = 1.0,
    n_backgrounds: int = 0,
    engine: str = "python",
) -> dict:
    """Deterministic single-example prep (aug_cfg=None -> test-time path).

    `n_backgrounds` > 0 activates green-screen background replacement: the
    prepared dict gains "source_mask"/"bg_params" (all batches of a loader
    must agree, so this is a loader-level switch, not per-example).
    `engine` selects the crop-parameter math (config `data.host_prep`):
    "python" numpy (golden-pinned default) or "native" C (production hosts;
    the rng draws are identical either way, results agree to ~1e-12)."""
    if aug_cfg is None:
        return prepare_example(
            example, joint_info, proc_side, tile_side, aug=None,
            box_expansion=box_expansion, with_background=n_backgrounds > 0,
            engine=engine,
        )
    rng = np.random.default_rng(rng_key)
    aug, occ_center = sample_aug_params(rng, aug_cfg, n_occluders, n_backgrounds)
    return prepare_example(
        example, joint_info, proc_side, tile_side, aug=aug, occ_center=occ_center,
        box_expansion=box_expansion, with_background=n_backgrounds > 0,
        engine=engine,
    )


# --- process-pool plumbing --------------------------------------------------
# Worker state installed once per process by the pool initializer; tasks then
# ship only (example index, rng key). Spawn (not fork): the parent holds JAX /
# TPU-runtime threads that must not be duplicated, and workers stay JAX-free.
_WORKER_STATE: dict = {}


_SPAWN_ENV_LOCK = threading.Lock()
_SPAWN_ENV_DEPTH = 0
_SPAWN_ENV_SAVED: dict = {}


def _patch_spawn_env() -> Callable[[], None]:
    """Make spawned interpreters start WITHOUT the TPU runtime; returns undo.

    Workers are pure numpy/PIL-free decode+prep — they must stay JAX-free.
    But a freshly spawned interpreter re-runs sitecustomize, and on axon dev
    hosts that hook keys off PALLAS_AXON_POOL_IPS to import jax and register
    the PJRT plugin through the (flaky) tunnel at interpreter start — before
    any of our code runs. Drop the trigger and pin JAX_PLATFORMS=cpu in the
    parent env for the pool's lifetime (spawn children inherit env at
    process creation; workers can spawn lazily at any submit). The parent's
    own already-imported jax is unaffected by env changes.

    The patch is REFCOUNTED on module globals: concurrent iterators (mixed
    3D+2D training holds two process pools, a mid-run eval may add a third)
    would otherwise each save/restore a snapshot, and an interleaved or
    GC-ordered undo could re-expose the TPU trigger to a pool that is still
    alive, or leave the parent pinned to cpu after all pools are gone. Only
    the FIRST patch saves the true originals; only the LAST undo restores
    them. Each returned undo is idempotent.
    """
    global _SPAWN_ENV_DEPTH
    with _SPAWN_ENV_LOCK:
        if _SPAWN_ENV_DEPTH == 0:
            _SPAWN_ENV_SAVED.clear()
            _SPAWN_ENV_SAVED.update({
                k: os.environ.get(k)
                for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
            })
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            os.environ["JAX_PLATFORMS"] = "cpu"
        _SPAWN_ENV_DEPTH += 1

    done = [False]

    def undo():
        global _SPAWN_ENV_DEPTH
        with _SPAWN_ENV_LOCK:
            if done[0]:
                return
            done[0] = True
            _SPAWN_ENV_DEPTH -= 1
            if _SPAWN_ENV_DEPTH == 0:
                for k, v in _SPAWN_ENV_SAVED.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v

    return undo


def _init_worker(get_example, joint_info, proc_side, tile_side, aug_cfg,
                 n_occluders, box_expansion, n_backgrounds, engine):
    _WORKER_STATE["args"] = (get_example, joint_info, proc_side, tile_side,
                             aug_cfg, n_occluders, box_expansion, n_backgrounds,
                             engine)


def _prep_in_worker(task):
    i, rng_key = task
    (get_example, joint_info, proc_side, tile_side, aug_cfg,
     n_occluders, box_expansion, n_backgrounds, engine) = _WORKER_STATE["args"]
    ex = get_example(int(i))
    return prepare_one(ex, joint_info, proc_side, tile_side, aug_cfg,
                       rng_key, n_occluders, box_expansion, n_backgrounds,
                       engine=engine)


def batch_iterator(
    get_example: Callable[[int], Example],
    n_examples: int,
    joint_info: JointInfo,
    batch_size: int,
    proc_side: int,
    tile_side: int,
    aug_cfg: Optional[AugConfig] = None,
    seed: int = 0,
    shuffle: bool = True,
    n_workers: int = 4,
    host_id: int = 0,
    host_count: int = 1,
    drop_remainder: bool = True,
    max_epochs: Optional[int] = None,
    box_expansion: float = 1.0,
    n_backgrounds: int = 0,
    skip_batches: int = 0,
    n_occluders: int = 1,
    pool_type: str = "thread",
    host_prep: str = "python",
) -> Iterator[dict]:
    """Stream batched host-prepared examples, epoch after epoch.

    `get_example(i)` materializes example i (decoding images lazily keeps the
    dataset an index, not a RAM-resident array). Training (aug_cfg set) loops
    forever unless `max_epochs` is given; evaluation does one deterministic,
    unshuffled pass (pass shuffle=False, max_epochs=1) and pads the tail batch
    when drop_remainder=False (callers mask with the returned "_pad" field).

    `pool_type="process"` runs decode + prep in spawn-based worker PROCESSES
    (config `data.pool_type`); `get_example` must then be picklable (dataset
    bound methods and functools.partial over them are; closures are not) and
    the caller's entry point needs the standard `if __name__ == "__main__"`
    guard (spawn re-imports __main__). Batches are identical across pool
    types by the (seed, epoch, idx) rng contract.
    """
    env_undo = None
    if pool_type == "process":
        env_undo = _patch_spawn_env()
        pool = _futures.ProcessPoolExecutor(
            max_workers=max(n_workers, 1),
            mp_context=multiprocessing.get_context("spawn"),
            initializer=_init_worker,
            initargs=(get_example, joint_info, proc_side, tile_side, aug_cfg,
                      n_occluders, box_expansion, n_backgrounds, host_prep),
        )
    elif pool_type == "thread":
        pool = _futures.ThreadPoolExecutor(max_workers=max(n_workers, 1))
    else:
        raise ValueError(f"pool_type must be thread|process, got {pool_type!r}")
    epoch = 0
    try:
        while max_epochs is None or epoch < max_epochs:
            order = np.arange(n_examples)
            if shuffle:
                np.random.default_rng((seed, epoch)).shuffle(order)
            local = order[host_id::host_count]

            if pool_type == "process":
                _epoch = epoch

                def prep_map(chunk):
                    return pool.map(
                        _prep_in_worker,
                        [(int(i), (seed, _epoch, int(i))) for i in chunk],
                    )
            else:
                def prep(i):
                    ex = get_example(int(i))
                    return prepare_one(
                        ex, joint_info, proc_side, tile_side, aug_cfg,
                        (seed, epoch, int(i)), n_occluders, box_expansion,
                        n_backgrounds, engine=host_prep,
                    )

                def prep_map(chunk):
                    return pool.map(prep, chunk)

            for start in range(0, len(local), batch_size):
                chunk = local[start : start + batch_size]
                if skip_batches > 0 and len(chunk) == batch_size:
                    # preemption-resume: consume the schedule without doing
                    # the (expensive) per-example prep, so a resumed run
                    # continues with the batches it has not yet trained on
                    # (rngs are (seed, epoch, index)-keyed, so the skipped
                    # batches are exactly the ones already consumed)
                    skip_batches -= 1
                    continue
                if len(chunk) < batch_size:
                    if drop_remainder:
                        break
                    pad = batch_size - len(chunk)
                    prepared = list(prep_map(chunk))
                    batch = stack_examples(prepared + [prepared[-1]] * pad)
                    batch["_pad"] = np.concatenate(
                        [np.ones(len(chunk), np.float32), np.zeros(pad, np.float32)]
                    )
                    yield batch
                    break
                batch = stack_examples(list(prep_map(chunk)))
                batch["_pad"] = np.ones(batch_size, np.float32)
                yield batch
            epoch += 1
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
        if env_undo is not None:
            env_undo()
