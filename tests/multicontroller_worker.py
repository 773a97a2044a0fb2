"""Multi-controller worker: one JAX process of an N-process CPU 'pod'.

Spawned by tests/test_multicontroller.py (and runnable by hand):

    python tests/multicontroller_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize`` links
them into one global mesh — the SAME code path a real multi-host TPU pod uses
(``macvo_tpu.parallel.mesh.init_distributed``; SURVEY.md §2.0 distributed
communication backend row). This exercises what ``dryrun_multichip`` cannot:
cross-PROCESS device addressing, the coordination service, and collectives
that hop process boundaries.

Run contract: prints ``MULTICONTROLLER OK`` and exits 0 only if
  * the global device/process topology is correct,
  * one data-parallel sharded train step produces a finite loss,
  * the observation-sharded BA solve matches the single-mesh reference.

All global arrays are created INSIDE jit with explicit out_shardings (the
multi-controller-safe idiom — host-local arrays are never shipped across
processes).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    # Exactly 4 virtual devices per process, regardless of inherited flags.
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from macvo_tpu.parallel.mesh import init_distributed

    init_distributed(coordinator=f"127.0.0.1:{port}",
                     num_processes=num_processes, process_id=process_id)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    n_devices = 4 * num_processes
    assert len(jax.devices()) == n_devices, jax.devices()

    devices = np.array(jax.devices())
    mesh = Mesh(devices, ("data",))
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P("data"))

    # ---- data-parallel train step over the 2-process mesh -------------------
    from macvo_tpu.models.flowformer import FlowFormerConfig, FlowFormerCov
    from macvo_tpu.train import (
        TrainConfig, TrainState, make_optimizer, make_sharded_train_step,
    )

    model = FlowFormerCov(FlowFormerConfig(decoder_depth=2))
    tcfg = TrainConfig(num_steps=100, training_mode="cov")
    h = w = 32

    def init_params(rng):
        probe = jnp.zeros((1, h, w, 3), jnp.float32)
        return model.init(rng, probe, probe)["params"]

    # Optimizer from ABSTRACT params (trainable_mask reads only tree paths),
    # so opt exists before any concrete global array does.
    opt = make_optimizer(tcfg, jax.eval_shape(init_params, jax.random.PRNGKey(0)))

    def init_state(rng):
        params = init_params(rng)
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32))

    state = jax.jit(init_state, out_shardings=replicated)(jax.random.PRNGKey(0))

    def make_batch(rng):
        b = n_devices
        return {
            "img1": jax.random.uniform(rng, (b, h, w, 3)),
            "img2": jax.random.uniform(jax.random.fold_in(rng, 1), (b, h, w, 3)),
            "gt_flow": jax.random.normal(jax.random.fold_in(rng, 2), (b, h, w, 2)),
            "flow_mask": jnp.ones((b, h, w, 1), bool),
        }

    batch = jax.jit(
        make_batch,
        out_shardings={k: batch_sharded for k in ("img1", "img2", "gt_flow", "flow_mask")},
    )(jax.random.PRNGKey(1))

    step = make_sharded_train_step(model, opt, tcfg, mesh)
    with mesh:
        state, aux = step(state, batch)
        loss = float(aux["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    print(f"[proc {process_id}] sharded train step OK, loss={loss:.4f}", flush=True)

    # ---- observation-sharded BA across the process boundary -----------------
    from macvo_tpu.backend.solver import TwoFrameData, solve_two_frame
    from macvo_tpu.geometry import camera, se3
    from macvo_tpu.parallel import make_sharded_solver

    obs_mesh = Mesh(devices, ("obs",))
    obs_replicated = NamedSharding(obs_mesh, P())
    n_obs = 8 * n_devices  # divides the mesh -> pad path is a no-op

    def make_problem(key):
        pose = se3.exp(0.05 * jax.random.normal(key, (6,)))
        pts_c = jnp.stack([
            jax.random.uniform(jax.random.fold_in(key, 1), (n_obs,), minval=4.0, maxval=20.0),
            jax.random.uniform(jax.random.fold_in(key, 2), (n_obs,), minval=-3.0, maxval=3.0),
            jax.random.uniform(jax.random.fold_in(key, 3), (n_obs,), minval=-2.0, maxval=2.0),
        ], axis=1)
        K = jnp.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]])
        eye3 = jnp.broadcast_to(jnp.eye(3) * 0.01, (n_obs, 3, 3))
        return TwoFrameData(
            pose0=pose, points_w=se3.act(pose, pts_c), points_c=pts_c,
            kp2=camera.point_to_pixel_ned(pts_c, K),
            disp2=K[0, 0] * 0.25 / pts_c[:, 0],
            cov_obs_c=eye3, cov_pts_w=eye3,
            cov_kp2=jnp.broadcast_to(jnp.eye(2) * 0.25, (n_obs, 2, 2)),
            disp2_cov=jnp.full((n_obs,), 0.25), K=K, baseline=jnp.asarray(0.25),
            mask=jnp.ones((n_obs,), bool),
        )

    data = jax.jit(
        make_problem,
        out_shardings=TwoFrameData(**{f: obs_replicated for f in TwoFrameData._fields}),
    )(jax.random.PRNGKey(3))

    pose_sharded = make_sharded_solver(obs_mesh, "icp")(data)
    pose_single = jax.jit(
        lambda d: solve_two_frame(d, graph_type="icp"), out_shardings=obs_replicated
    )(data)
    err = float(jnp.max(jnp.abs(pose_sharded - pose_single)))
    assert err < 1e-6, f"cross-process sharded BA diverged: {err}"
    print(f"[proc {process_id}] obs-sharded BA matches single-mesh (|diff|={err:.2e})",
          flush=True)

    print("MULTICONTROLLER OK", flush=True)


if __name__ == "__main__":
    main()
