"""Golden-value regression test: a fixed scene rendered with fixed weights
must keep producing the same values (CPU, f32). Catches silent renderer
regressions (sampling, compositing, warp, embedding changes).

Regenerate after INTENTIONAL numerics changes:
    python tests/test_golden.py regenerate
"""

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = osp.join(osp.dirname(__file__), "golden_render.npz")


def _setup():
    import sys
    sys.path.insert(0, osp.dirname(__file__))
    from test_render import make_rays, stage3_setup
    from moco_flow_tpu.render.volume import RenderConfig
    params, statics = stage3_setup(jax.random.key(42))
    rays = make_rays(16, key=7, with_chain=True)
    rcfg = RenderConfig(n_samples=16, n_importance=16, use_nof=True,
                        chain_local=True, chain_global=True)
    anneal = {"nerf_xyz": jnp.full(10, 0.5), "nof_xyz": jnp.full(5, 0.5)}
    return params, statics, anneal, rays, rcfg


def _render():
    from moco_flow_tpu.render.volume import render_rays
    params, statics, anneal, rays, rcfg = _setup()
    out = render_rays(params, statics, anneal, rays, jnp.full((16, 3), 0.8),
                      jax.random.key(3), rcfg)
    return {k: np.asarray(v) for k, v in out.items()}


def test_golden_render():
    got = _render()
    with np.load(GOLDEN) as data:
        for k in data.files:
            assert k in got, f"output {k} disappeared"
            np.testing.assert_allclose(
                got[k], data[k], rtol=2e-4, atol=2e-5,
                err_msg=f"renderer output {k} drifted from golden values")
        assert set(got) == set(data.files)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        np.savez(GOLDEN, **_render())
        print(f"wrote {GOLDEN}")
