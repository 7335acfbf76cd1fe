"""Numeric parity of the relation-variant building blocks vs the
reference's OWN torch modules (MSDN message-passing unit + linear GRU,
GRCNN collection unit, RelPN relationshipness)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.reference_stubs import install  # noqa: E402

install()
sys.path.insert(0, "/root/reference/prompt_feat")


def _dense(mod):
    return {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
            "bias": jnp.asarray(mod.bias.detach().numpy())}


def test_mpu_v1_matches_reference():
    from scene_graph_benchmark.relation_head.msdn.msdn_base import (
        Message_Passing_Unit_v1)

    from cpt_tpu.models.detector.relation_variants import _MPU

    torch.manual_seed(0)
    ref = Message_Passing_Unit_v1(fea_size=12, filter_size=8).eval()
    rng = np.random.RandomState(0)
    unary = rng.randn(5, 12).astype(np.float32)
    pair = rng.randn(5, 12).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(unary), torch.from_numpy(pair)).numpy()

    mine = _MPU(filter_size=8)
    params = {"params": {"w": _dense(ref.w)}}
    got = mine.apply(params, jnp.asarray(unary), jnp.asarray(pair))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_linear_gru_matches_reference():
    from scene_graph_benchmark.relation_head.msdn.msdn_base import (
        Gated_Recurrent_Unit)

    from cpt_tpu.models.detector.relation_variants import _LinearGRU

    torch.manual_seed(1)
    ref = Gated_Recurrent_Unit(fea_size=10, dropout=False).eval()
    rng = np.random.RandomState(1)
    x = rng.randn(4, 10).astype(np.float32)
    h = rng.randn(4, 10).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    mine = _LinearGRU(dim=10)
    params = {"params": {"wih": _dense(ref.wih), "whh": _dense(ref.whh)}}
    got = mine.apply(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_collection_unit_matches_reference():
    from scene_graph_benchmark.relation_head.grcnn.agcn.agcn import (
        _Collection_Unit)

    from cpt_tpu.models.detector.relation_variants import _Collect

    torch.manual_seed(2)
    ref = _Collection_Unit(dim_in=6, dim_out=9).eval()
    rng = np.random.RandomState(2)
    source = rng.randn(7, 6).astype(np.float32)
    att = (rng.rand(5, 7) > 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref(None, torch.from_numpy(source),
                   torch.from_numpy(att)).numpy()

    mine = _Collect(dim_out=9)
    params = {"params": {"fc": _dense(ref.fc)}}
    got = mine.apply(params, jnp.asarray(source), jnp.asarray(att))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_relationshipness_matches_reference():
    from scene_graph_benchmark.relation_head.relpn.relationshipness import (
        Relationshipness)

    from cpt_tpu.models.detector.relation_variants import (
        Relationshipness as Mine)

    torch.manual_seed(3)
    ref = Relationshipness(dim=16, pos_encoding=False).eval()
    rng = np.random.RandomState(3)
    x = rng.randn(6, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    mine = Mine(pos_encoding=False)
    params = {"params": {
        "subj_proj_fc1": _dense(ref.subj_proj[0]),
        "subj_proj_fc2": _dense(ref.subj_proj[2]),
        "obj_proj_fc1": _dense(ref.obj_prof[0]),
        "obj_proj_fc2": _dense(ref.obj_prof[2]),
    }}
    got = mine.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
