"""Checkpoint round-trip: torch → pytree → torch must load strict=True into
the reference model and preserve the forward output bit-for-bit."""

import numpy as np
import pytest
import torch

from tests.reference_oracle import load_reference_vda, reference_state_numpy
from video_depth_anything_tpu.config import get_model_config
from video_depth_anything_tpu.io.checkpoint import (
    convert_torch_state_dict,
    export_torch_state_dict,
)

pytestmark = pytest.mark.slow  # torch-oracle / multi-process tier: excluded from the fast lane (pytest -m 'not slow')



def test_roundtrip_strict_and_forward(rng):
    model = load_reference_vda("vits", seed=0)
    cfg = get_model_config("vits")
    state = reference_state_numpy(model)

    params = convert_torch_state_dict(state, cfg)
    back = export_torch_state_dict(params, cfg)

    # strict load back into a fresh reference model
    model2 = load_reference_vda("vits", seed=1)
    model2.load_state_dict({k: torch.from_numpy(v) for k, v in back.items()}, strict=True)

    x = torch.from_numpy(rng.randn(1, 2, 3, 56, 56).astype(np.float32))
    with torch.no_grad():
        a = model.forward(x).numpy()
        b = model2.forward(x).numpy()
    np.testing.assert_array_equal(a, b)
