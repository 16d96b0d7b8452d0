import numpy as np
import jax.numpy as jnp

from cnmf_e_tpu.config import BackgroundParams, CNMFEParams
from cnmf_e_tpu.models.background import (background_of, update_background)
from cnmf_e_tpu.models.state import empty_state
from cnmf_e_tpu.utils.simulate import simulate_movie


def test_ring_background_with_ssub():
    gt = simulate_movie(seed=5, H=40, W=40, T=300, K=4, sn=0.05,
                        bg_strength=1.0)
    params = CNMFEParams(background=BackgroundParams(
        model="ring", ring_radius=8, ssub=2))
    st = empty_state(8, 40, 40, 300)
    st = st.replace(A=st.A.at[:4].set(jnp.asarray(gt.A)),
                    C=st.C.at[:4].set(jnp.asarray(gt.C)),
                    active=st.active.at[:4].set(True))
    Y = jnp.asarray(gt.Y)
    st = update_background(Y, st, params)
    # downsampled ring weights live on the 20x20 grid
    assert st.W.w.shape[0] == 20 * 20
    B = np.asarray(background_of(Y, st, params))
    assert B.shape == gt.Y.shape
    true_B = gt.Bf + gt.b0[None]
    err = np.mean((B - true_B) ** 2)
    err_static = np.mean((true_B.mean(axis=0, keepdims=True) - true_B) ** 2)
    assert err < 0.6 * err_static, (err, err_static)
