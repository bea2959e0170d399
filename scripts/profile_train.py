"""Training-step throughput at reference config (bs=64, full-size models)."""
import sys, time
sys.path.insert(0, "/root/repo")
from rohm_tpu.utils import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from rohm_tpu.body import synthetic_model
from rohm_tpu.diffusion import make_schedule
from rohm_tpu.models import PoseNet, TrajNet
from rohm_tpu.train import create_train_state, make_posenet_train_step, make_trajnet_train_step

B, T = 64, 144
body = synthetic_model(num_verts=64)
mean, std = jnp.zeros(294), jnp.ones(294)
key = jax.random.PRNGKey(0)
TRAJ_W = {"weight_loss_root_rec_repr": 1.0, "weight_loss_root_pos_global": 100.0,
          "weight_loss_root_vel_global": 1000.0, "weight_loss_root_smplx_transl_vel": 1000.0,
          "weight_loss_root_smplx_rot_vel": 1.0, "weight_loss_root_rot_vel_from_abs_traj": 1.0}
POSE_W = {"weight_loss_rec_repr_full_body": 1.0, "weight_loss_repr_foot_contact_mse": 1.0,
          "weight_loss_joint_pos_global": 100.0, "weight_loss_joint_vel_global": 1000.0,
          "weight_loss_foot_skating": 0.1}

def bench(tag, step, state, batch, *extra):
    t0 = time.perf_counter()
    state, _ = step(state, batch, key, *extra)
    jax.block_until_ready(state.params)
    print(f"[{tag}] compile+1st {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, _ = step(state, batch, key, *extra)
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / n
    print(f"[{tag}] {dt*1e3:.1f} ms/step -> {1/dt:.1f} steps/s (bs={B})", flush=True)

# TrajNet (100-step diffusion, abs-only 13)
m = TrajNet(traj_feat_dim=13, cond_dim=13)
p = jax.jit(m.init)(key, jnp.zeros((1, T, 13)), jnp.zeros((1, T, 13)), jnp.zeros(1, jnp.int32))
st = create_train_state(p, lr=1e-4)
step = make_trajnet_train_step(m, make_schedule("cosine", 100), mean, std, body, TRAJ_W)
batch = {"motion_repr_clean": jnp.zeros((B, T, 294)), "cond": jnp.zeros((B, T, 13))}
bench("trajnet", step, st, batch)

# PoseNet (1000-step diffusion)
m2 = PoseNet()
p2 = jax.jit(m2.init)(key, jnp.zeros((1, T, 294)), jnp.zeros((1, T, 294)), jnp.zeros(1, jnp.int32))
st2 = create_train_state(p2, lr=1e-4)
step2 = make_posenet_train_step(m2, make_schedule("cosine", 1000), mean, std, body, POSE_W)
batch2 = {"motion_repr_clean": jnp.zeros((B, T, 294)), "cond": jnp.zeros((B, T, 294))}
bench("posenet", step2, st2, batch2, jnp.asarray(1.0))
