"""Weight-converter structural tests: roundtrip through a synthesized
ultralytics-layout state_dict must reproduce the flax tree exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from stereo_vision_tpu.models import YOLOv8
from stereo_vision_tpu.models.convert import (
    convert_ultralytics_state_dict,
    flax_tree_to_fake_state_dict,
)


def test_roundtrip_exact():
    model = YOLOv8(num_classes=80, variant="n")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0), x, train=False))
    sd = flax_tree_to_fake_state_dict(variables, variant="n")
    assert any(k.startswith("model.22.cv3") for k in sd)
    rebuilt = convert_ultralytics_state_dict(sd, variant="n")

    flat_ref, tree_ref = jax.tree_util.tree_flatten_with_path(variables)
    flat_new = dict(jax.tree_util.tree_flatten_with_path(rebuilt)[0])
    ref = dict(flat_ref)
    assert set(map(str, ref.keys())) == set(map(str, flat_new.keys()))
    for k, v in ref.items():
        np.testing.assert_array_equal(flat_new[k], v, err_msg=str(k))


def test_converted_tree_loads_into_model():
    model = YOLOv8(num_classes=80, variant="n")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0), x, train=False))
    sd = flax_tree_to_fake_state_dict(variables, variant="n")
    rebuilt = jax.tree.map(jnp.asarray, convert_ultralytics_state_dict(sd, variant="n"))
    out = model.apply(rebuilt, x, train=False)
    ref = model.apply(variables, x, train=False)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
