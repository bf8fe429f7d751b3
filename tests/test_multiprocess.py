"""Multi-process (multi-host simulation) jax.distributed smoke.

Two processes rendezvous through jax.distributed.initialize (the DIST
INITIALIZE path that replaces torch.distributed env:// init,
train_adv.py:84-88), each contributing 2 virtual CPU devices; the test
asserts global device enumeration and a cross-process psum.
"""

import os
import signal
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    # cross-process collective: psum of per-device ranks over all 4 devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
    def f(x):
        return jax.lax.psum(x, "data")
    from jax.experimental.shard_map import shard_map
    g = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P()))
    local = np.arange(4, dtype=np.float32)  # global array [0,1,2,3]
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local[2 * pid: 2 * pid + 2],
        global_shape=(4,))
    out = g(arr)
    total = float(np.asarray(jax.device_get(out))[()] if out.ndim == 0 else
                  np.asarray(jax.device_get(out))[0])
    assert abs(total - 6.0) < 1e-6, total
    print(f"proc{pid} OK total={total}", flush=True)
""")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    procs = [subprocess.Popen([sys.executable, str(worker), str(port), str(i)],
                              cwd=REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i}:\n{out[-3000:]}"
        assert f"proc{i} OK" in out


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.data import DataLoader, SyntheticDataset
    from rnd_semantic_segmentation_tpu.models import build_segmentor
    from rnd_semantic_segmentation_tpu.parallel import make_mesh, shard_batch
    from rnd_semantic_segmentation_tpu.train import (
        Segmentor, make_optimizers, make_src_train_step)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4

    mesh = make_mesh(cfg)  # 4 global devices
    assert mesh.devices.size == 4

    ds = SyntheticDataset(size=(32, 32), length=16, num_classes=2)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                        process_shard=True)  # local batch 4, global 8
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 2)
    variables = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = make_src_train_step(seg, cfg, steps_per_epoch=4)

    losses = []
    for batch in loader:
        global_batch = shard_batch(
            {"image": batch["image"], "label": batch["label"]}, mesh)
        state, m = step(state, global_batch, jnp.float32(0))
        losses.append(float(m["loss"]))
    assert len(losses) == 2 and all(np.isfinite(losses))
    # parameter agreement across processes (replicated state)
    leaf = np.asarray(jax.device_get(
        jax.tree.leaves(state.modules["classifier"].params)[0]))
    print(f"proc{pid} TRAIN OK loss={losses[-1]:.4f} psum={leaf.sum():.6f}",
          flush=True)
""")


_FADA_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.data import DataLoader, SyntheticDataset
    from rnd_semantic_segmentation_tpu.models import (
        build_adversarial_discriminator, build_segmentor)
    from rnd_semantic_segmentation_tpu.parallel import make_mesh, shard_batch
    from rnd_semantic_segmentation_tpu.train import (
        Segmentor, make_optimizers)
    from rnd_semantic_segmentation_tpu.train.fada import (
        FadaState, init_disc_state, make_fada_train_step)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.BASE_LR_D = 1e-4

    mesh = make_mesh(cfg)  # 4 global devices
    # per-process src+tgt loader shards (the reference's only live DDP
    # surface, train_adv.py:81-88: DistributedSampler on both loaders)
    src_ds = SyntheticDataset(size=(32, 32), length=16, num_classes=2)
    tgt_ds = SyntheticDataset(size=(32, 32), length=16, num_classes=2,
                              shift="swap")
    src_l = DataLoader(src_ds, batch_size=2, shuffle=True, seed=5,
                       process_shard=True)
    tgt_l = DataLoader(tgt_ds, batch_size=2, shuffle=True, seed=7,
                       process_shard=True)

    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 2)
    variables = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    seg_state = seg.make_states(variables, make_optimizers(spec, cfg))
    params = {n: m.params for n, m in seg_state.modules.items()}
    stats = {n: m.stats for n, m in seg_state.modules.items()}
    tap = jax.eval_shape(
        lambda p, x: seg.forward(p, stats, x, train=False)[2],
        params, jnp.zeros((1, 32, 32, 3)))
    disc = build_adversarial_discriminator(cfg)
    disc_state = init_disc_state(disc, jax.random.PRNGKey(1),
                                 jnp.zeros(tap.shape, jnp.float32), cfg)
    state = jax.device_put(FadaState(seg=seg_state, disc=disc_state),
                           NamedSharding(mesh, P()))
    step = make_fada_train_step(seg, disc, cfg, steps_per_epoch=4)

    n_steps = 0
    for sb, tb in zip(src_l, tgt_l):
        gs = shard_batch({"image": sb["image"], "label": sb["label"]}, mesh)
        gt = shard_batch({"image": tb["image"], "label": tb["label"]}, mesh)
        state, m = step(state, gs, gt, jnp.float32(0))
        assert np.isfinite(float(m["loss_seg"]))
        assert np.isfinite(float(m["loss_D_src"]))
        n_steps += 1
    assert n_steps == 4, n_steps
    g_leaf = np.asarray(jax.device_get(
        jax.tree.leaves(state.seg.modules["classifier"].params)[0]))
    d_leaf = np.asarray(jax.device_get(
        jax.tree.leaves(state.disc.params)[0]))
    print(f"proc{pid} FADA OK gsum={g_leaf.sum():.6f} dsum={d_leaf.sum():.6f}",
          flush=True)
""")


_EVAL_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.data import (
        DataLoader, SyntheticDataset, build_collate_fn)
    from rnd_semantic_segmentation_tpu.eval.metrics import (
        intersection_and_union)
    from rnd_semantic_segmentation_tpu.eval.tester import Tester
    from rnd_semantic_segmentation_tpu.utils import setup_logger

    out_dir = sys.argv[3]
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.FREEZE_BN = True
    cfg.INPUT.INPUT_SIZE_TEST = (32, 32)
    cfg.DATASETS.TEST = "synthetic_val"
    cfg.TEST.BATCH_SIZE = 4  # global; local loader batch = 2
    cfg.OUTPUT_DIR = out_dir

    ds = SyntheticDataset(size=(32, 32), length=16, num_classes=2)
    loader = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        process_shard=True,
                        collate_fn=build_collate_fn(cfg))
    logger = setup_logger(f"mp_eval_{pid}", out_dir, pid)
    tester = Tester(cfg, loader, logger)
    tester.variables = tester._replicate(tester.segmentor.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32)))
    host_vars = jax.device_get(tester.variables)
    summary = tester.test()

    # single-process reference on the SAME model over the FULL dataset:
    # micro metrics + confusion are batch-grouping independent
    inter_s = np.zeros(2); union_s = np.zeros(2)
    fwd = jax.jit(lambda v, x: tester._probs_impl(v, x, (32, 32)))
    for i in range(0, len(ds), 4):
        items = [ds[j] for j in range(i, i + 4)]
        x = jnp.asarray(np.stack([it[0] for it in items]), jnp.float32)
        y = jnp.asarray(np.stack([it[1] for it in items]).astype(np.int32))
        pred = jnp.argmax(fwd(host_vars, x), axis=-1)
        inter, union, _, _ = intersection_and_union(pred, y, 2, 255)
        inter_s += np.asarray(inter); union_s += np.asarray(union)
    ref_micro = float(np.mean(inter_s / (union_s + 1e-10)))
    assert abs(summary["micro_miou"] - ref_micro) < 1e-6, (
        summary["micro_miou"], ref_micro)
    print(f"proc{pid} EVAL OK micro={summary['micro_miou']:.6f}", flush=True)
""")


def _run_two(tmp_path, script, extra_args=()):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(script)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(i), *extra_args],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i}:\n{out[-3000:]}"
    return outs


@pytest.mark.slow
def test_two_process_fada_training(tmp_path):
    """2-process adversarial step: per-process src+tgt loader shards; G and D
    must stay replicated-identical across processes after 4 steps."""
    outs = _run_two(tmp_path, _FADA_WORKER)
    sums = []
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if "FADA OK" in l][0]
        sums.append(line.split("FADA OK ")[1])
    assert sums[0] == sums[1], sums


@pytest.mark.slow
def test_two_process_eval(tmp_path):
    """2-process Tester eval: psum-reduced metrics match a single-process
    full-dataset reference bit-for-bit (micro metrics)."""
    outs = _run_two(tmp_path, _EVAL_WORKER,
                    extra_args=(str(tmp_path / "eval_out"),))
    vals = []
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if "EVAL OK" in l][0]
        vals.append(line.split("micro=")[1])
    assert vals[0] == vals[1], vals


@pytest.mark.slow
def test_two_process_sharded_training(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(worker), str(port), str(i)],
                              cwd=REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    sums = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i}:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if "TRAIN OK" in l][0]
        sums.append(line.split("psum=")[1])
    assert sums[0] == sums[1], sums  # identical replicated params


_PREEMPT_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.data import DataLoader, SyntheticDataset
    from rnd_semantic_segmentation_tpu.models import build_segmentor
    from rnd_semantic_segmentation_tpu.parallel import make_mesh, shard_batch
    from rnd_semantic_segmentation_tpu.parallel.mesh import process_is_primary
    from rnd_semantic_segmentation_tpu.ckpt.orbax_io import (
        checkpoint_name, latest_checkpoint, load_checkpoint, save_checkpoint)
    from rnd_semantic_segmentation_tpu.train import (
        Segmentor, make_optimizers, make_src_train_step)

    EPOCHS = 3
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-3

    mesh = make_mesh(cfg)  # 4 global devices (2 per process)
    ds = SyntheticDataset(size=(32, 32), length=16, num_classes=2)
    # local batch 4 -> global batch 8, 2 steps/epoch; shuffle is f(seed,epoch)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=11,
                        process_shard=True)
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 2)
    variables = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    state = jax.device_put(state, NamedSharding(mesh, P()))
    start_epoch = 1
    found = latest_checkpoint(out_dir, spec.ckpt_prefix)
    if found:
        # BOTH processes restore from the rank-0-written checkpoint
        state, start_epoch = load_checkpoint(found, state)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        print(f"proc{pid} RESUMED from {found}", flush=True)
    step = make_src_train_step(seg, cfg, steps_per_epoch=2,
                               base_rng=jax.random.PRNGKey(cfg.SEED + 1))

    hang_epoch = int(os.environ.get("PREEMPT_HANG_EPOCH", "0"))
    for epoch in range(start_epoch, EPOCHS + 1):
        loader.set_epoch(epoch)
        for bi, batch in enumerate(loader):
            gb = shard_batch({"image": batch["image"],
                              "label": batch["label"]}, mesh)
            state, m = step(state, gb, jnp.float32(epoch - 1))
            assert np.isfinite(float(m["loss"]))
            if pid == 1 and epoch == hang_epoch and bi == 0:
                # simulate a wedged host mid-epoch: the test SIGKILLs us at
                # this sentinel; rank 0 then blocks in the next collective
                open(os.path.join(out_dir, "HANGING"), "w").write("x")
                import time as _t
                while True:
                    _t.sleep(1)
        if process_is_primary():
            save_checkpoint(checkpoint_name(out_dir, spec.ckpt_prefix, epoch),
                            state, epoch, wait=True)
    allsum = sum(float(np.abs(np.asarray(jax.device_get(l))).sum())
                 for l in jax.tree.leaves(
                     {n: m.params for n, m in state.modules.items()}))
    assert allsum > 0.0
    print(f"proc{pid} PREEMPT OK sum={allsum:.9f}", flush=True)
""")


def _communicate_all(procs, timeout=1200):
    """communicate() both workers, KILLING them on timeout — an expired
    subprocess timeout leaves children running otherwise, and two orphaned
    jax processes starve this 1-core host for every later test."""
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return outs


def _spawn_preempt(tmp_path, out_dir, env_extra=None):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "preempt_worker.py"
    worker.write_text(_PREEMPT_WORKER)
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra or {})
    return [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(i), str(out_dir)],
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]


@pytest.mark.slow
def test_two_process_preemption_resume(tmp_path):
    """VERDICT r4 item 6: SIGKILL ONE process of a 2-process jax.distributed
    run mid-epoch, restart BOTH, and assert the resumed run's final state is
    bit-identical to an uninterrupted 2-process run — exercising the
    rank-0-only checkpoint + fresh-rendezvous interaction the single-process
    drill (test_preemption.py) cannot reach."""
    import time as _time

    import numpy as np

    # --- run A: uninterrupted --------------------------------------------
    out_a = tmp_path / "uninterrupted"
    out_a.mkdir()
    procs = _spawn_preempt(tmp_path, out_a)
    outs = _communicate_all(procs)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i}:\\n{out[-3000:]}"
    sums_a = sorted(out.split("sum=")[1].split()[0]
                    for out in outs if "PREEMPT OK" in out)

    # --- run B: rank 1 dies mid-epoch-2 ----------------------------------
    out_b = tmp_path / "preempted"
    out_b.mkdir()
    procs = _spawn_preempt(tmp_path, out_b,
                           env_extra={"PREEMPT_HANG_EPOCH": "2"})
    sentinel = out_b / "HANGING"
    deadline = _time.time() + 600
    while not sentinel.exists():
        assert procs[1].poll() is None, "rank 1 died before the hang point"
        assert _time.time() < deadline, "hang sentinel never appeared"
        _time.sleep(0.5)
    os.kill(procs[1].pid, signal.SIGKILL)  # hard preemption of rank 1
    procs[1].wait(timeout=60)
    # rank 0 is now blocked in (or erroring out of) a cross-process
    # collective; give it a moment, then take the whole job down as a
    # cluster manager would
    _time.sleep(3.0)
    if procs[0].poll() is None:
        os.kill(procs[0].pid, signal.SIGKILL)
    procs[0].wait(timeout=60)
    # the epoch-2 checkpoint must NOT exist (the kill landed mid-epoch,
    # before rank 0 reached the save)
    assert (out_b / "Aspp-1").is_dir()
    assert not (out_b / "Aspp-2").exists(), "kill landed too late"

    # --- restart BOTH with a fresh rendezvous; resume from latest ---------
    procs = _spawn_preempt(tmp_path, out_b)
    outs = _communicate_all(procs)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i}:\\n{out[-3000:]}"
        assert "RESUMED" in out
    sums_b = sorted(out.split("sum=")[1].split()[0]
                    for out in outs if "PREEMPT OK" in out)
    assert sums_a == sums_b, (sums_a, sums_b)

    # the strong check: EVERY leaf of the final checkpoint (params, BN
    # stats, optimizer state, step counter) is bit-identical between the
    # uninterrupted and the preempted+resumed run
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        tree_a = ckptr.restore(str((out_a / "Aspp-3").resolve()))
        tree_b = ckptr.restore(str((out_b / "Aspp-3").resolve()))
    import jax as _jax
    flat_a = _jax.tree_util.tree_flatten_with_path(tree_a)[0]
    flat_b = dict(_jax.tree_util.tree_flatten_with_path(tree_b)[0])
    assert len(flat_a) == len(flat_b) > 10
    for k, v in flat_a:
        if not hasattr(v, "shape"):
            assert v == flat_b[k], k
            continue
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_b[k]),
            err_msg=f"leaf {_jax.tree_util.keystr(k)} differs after "
                    f"2-process preemption+resume")
