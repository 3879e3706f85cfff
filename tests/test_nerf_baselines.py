"""Exercise the unarticulated baselines end-to-end: MLPNeRF and TriPlaneNeRF
render real frames through render_rays, and MLPNeRF overfits a constant
target (reference class-hierarchy parity: libraries/NeRF/nerf.py:30,
libraries/triplane/triplane_nerf.py:51)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from enarf_gan_tpu.models.narf import NARFParams
from enarf_gan_tpu.models.nerf import MLPNeRF, TriPlaneNeRF
from enarf_gan_tpu.nerf.rendering import RenderConfig, render_rays


SIZE = 16


def _scene():
    """One unit cube two meters in front of a pinhole camera."""
    pose = jnp.eye(4)[None, None].at[:, :, 2, 3].set(2.5)  # (B, 1, 4, 4)
    K = np.array([[SIZE, 0, SIZE / 2], [0, SIZE, SIZE / 2], [0, 0, 1]],
                 np.float32)
    inv_K = jnp.asarray(np.linalg.inv(K))
    idx = np.arange(SIZE * SIZE)
    coords = np.stack([idx % SIZE + 0.5, idx // SIZE + 0.5,
                       np.ones_like(idx)], 0).astype(np.float32)
    return pose, inv_K, jnp.asarray(coords).reshape(1, 1, 3, -1)


@pytest.mark.parametrize("view_dependent", [False, True])
def test_mlp_nerf_renders(view_dependent):
    params = NARFParams(Nc=6, Nf=8, hidden_size=32,
                        num_frequency_for_position=4,
                        view_dependent=view_dependent)
    model = MLPNeRF(params=params, z_dim=8, z2_dim=8)
    pose, inv_K, coords = _scene()
    z = jnp.ones((1, 8))
    rd_init = jnp.ones((1, 3, 4)) if view_dependent else None
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 3, 4)), pose, z, z, rd_init,
                           method="density_color")

    def fn(points, ray_dir, pose_scaled):
        d, c, _ = model.apply(variables, points, pose_scaled, z, z, ray_dir,
                              method="density_color")
        return d, c

    cfg = RenderConfig(Nc=6, Nf=8, view_dependent=view_dependent)
    color, mask, disp, _ = render_rays(
        jax.random.PRNGKey(1), fn, coords, pose, inv_K, cfg,
        camera_pose=jnp.eye(3)[None] if view_dependent else None)
    assert color.shape == (1, 3, SIZE * SIZE)
    assert np.isfinite(np.asarray(color)).all()
    assert np.isfinite(np.asarray(mask)).all()
    assert np.isfinite(np.asarray(disp)).all()
    # rays through the cube produce nonzero accumulation somewhere
    assert float(np.abs(np.asarray(mask)).sum()) > 0


def test_triplane_nerf_renders_constant_plane():
    params = NARFParams(Nc=6, Nf=8, tri_plane_size=32, feat_dim=8,
                        view_dependent=False, constant_triplane=True)
    model = TriPlaneNeRF(params=params, z_dim=8, z2_dim=8)
    pose, inv_K, coords = _scene()
    z = jnp.ones((1, 8))
    variables = model.init(jax.random.PRNGKey(0), z,
                           method="compute_tri_plane_feature")
    planes = model.apply(variables, z, method="compute_tri_plane_feature")
    assert planes.shape == (1, 8 * 3, 32, 32)
    v_heads = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 3, 4)), pose,
                         planes, z, None, method="density_color")
    variables = {"params": {**variables["params"], **v_heads["params"]}}

    def fn(points, ray_dir, pose_scaled):
        d, c, _ = model.apply(variables, points, pose_scaled, planes, z,
                              ray_dir, method="density_color")
        return d, c

    cfg = RenderConfig(Nc=6, Nf=8, view_dependent=False)
    color, mask, disp, _ = render_rays(jax.random.PRNGKey(1), fn, coords,
                                       pose, inv_K, cfg)
    assert color.shape == (1, 3, SIZE * SIZE)
    assert np.isfinite(np.asarray(color)).all()


def test_triplane_nerf_generator_planes():
    """StyleGAN-generated tri-planes (the non-constant path) produce finite
    densities/colors at arbitrary points."""
    params = NARFParams(Nc=4, Nf=4, tri_plane_size=16, feat_dim=8, w_dim=16,
                        view_dependent=False, constant_triplane=False)
    model = TriPlaneNeRF(params=params, z_dim=16, z2_dim=16)
    z = jnp.ones((1, 16))
    variables = model.init(jax.random.PRNGKey(0), z,
                           method="compute_tri_plane_feature")
    planes = model.apply(variables, z, method="compute_tri_plane_feature")
    assert planes.shape == (1, 8 * 3, 16, 16)
    pose = jnp.eye(4)[None, None]
    pts = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 50), minval=-1,
                             maxval=1)
    v_heads = model.init(jax.random.PRNGKey(3), pts, pose, planes, z, None,
                         method="density_color")
    variables = {"params": {**variables["params"], **v_heads["params"]}}
    d, c, _ = model.apply(variables, pts, pose, planes, z, None,
                          method="density_color")
    assert d.shape == (1, 1, 50)
    assert np.isfinite(np.asarray(d)).all()
    assert np.isfinite(np.asarray(c)).all()


def test_mlp_nerf_overfits():
    """10 Adam steps on a fixed point batch must reduce a density-matching
    loss — the gradient path through PE→MLP→heads works."""
    params = NARFParams(Nc=4, Nf=4, hidden_size=32,
                        num_frequency_for_position=4, view_dependent=False)
    model = MLPNeRF(params=params, z_dim=8, z2_dim=8)
    pose = jnp.eye(4)[None, None]
    z = jnp.ones((1, 8))
    pts = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 256), minval=-0.9,
                             maxval=0.9)
    target = (pts[:, :1] > 0).astype(jnp.float32) * 3.0  # half-space density

    variables = model.init(jax.random.PRNGKey(1), pts, pose, z, z,
                           method="density_color")
    opt = optax.adam(1e-2)
    state = opt.init(variables["params"])

    def loss_fn(p):
        d, _, _ = model.apply({"params": p}, pts, pose, z, z, None,
                              method="density_color")
        return jnp.mean((d - target) ** 2)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    p = variables["params"]
    first = None
    for i in range(10):
        p, state, l = step(p, state)
        if first is None:
            first = float(l)
    assert float(l) < first, (float(l), first)
