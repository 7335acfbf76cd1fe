"""Checkpoint-readiness harness: the torch.save → load → convert → extract
→ score chain dry-runs end-to-end on random weights in the real .pth/.bin
layouts (tools/validate_checkpoints.py)."""
import numpy as np
import pytest

from cpt_tpu.tools.validate_checkpoints import main as vck_main


@pytest.mark.slow
def test_dryrun_end_to_end(tmp_path):
    report = vck_main(["--dryrun", "--workdir", str(tmp_path),
                       "--n_images", "4", "--dtype", "float32",
                       "--windowed_drift"])
    assert report["vinvl"].endswith(".pth")
    assert report["oscar"].endswith(".bin")
    assert np.isfinite(report["zero_shot_accuracy"])
    # tiny backbone: halo default >= 2x RF -> the windowed path is exact
    assert report["windowed_drift"]["feat_max_rel"] < 5e-3
    assert report["windowed_drift"]["label_agreement"] == 1.0


@pytest.mark.slow
def test_random_state_dicts_convert():
    """The random layouts convert into trees matching real model params."""
    import jax
    import jax.numpy as jnp

    from cpt_tpu.config.bert import tiny_bert_config
    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.models.detector.convert import (
        convert_detector_state_dict, random_vinvl_state_dict)
    from cpt_tpu.utils.convert import (convert_bert_state_dict,
                                       random_oscar_state_dict)

    dcfg = tiny_detector_config()
    det = convert_detector_state_dict(random_vinvl_state_dict(dcfg), dcfg)
    from cpt_tpu.models.detector.attr_rcnn import AttrRCNN

    m = dcfg.max_force_boxes
    model = AttrRCNN(dcfg)
    init = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((64, 64, 3)), jnp.asarray([64, 64]),
        jnp.zeros((m, 4)), jnp.ones((m,), bool))
    assert (jax.tree_util.tree_map(lambda x: x.shape, init["params"])
            == jax.tree_util.tree_map(lambda x: x.shape, det))

    bcfg = tiny_bert_config()
    bert = convert_bert_state_dict(random_oscar_state_dict(bcfg), bcfg)
    assert set(bert) == {"bert", "mlm_head", "nsp_head"}
    emb = bert["bert"]["embeddings"]["word_embeddings"]["embedding"]
    assert emb.shape == (bcfg.vocab_size, bcfg.hidden_size)


def test_suffix_aligner_handles_prefixed_checkpoints(tmp_path):
    """'module.'-wrapped (DDP-style) checkpoints load through the suffix
    aligner (reference model_serialization.py:35) identically to direct."""
    import torch

    from cpt_tpu.models.detector.config import tiny_detector_config
    from cpt_tpu.models.detector.convert import (load_vinvl_checkpoint,
                                                 random_vinvl_state_dict)

    cfg = tiny_detector_config()
    sd = random_vinvl_state_dict(cfg)
    direct_path = tmp_path / "direct.pth"
    wrapped_path = tmp_path / "wrapped.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               direct_path)
    torch.save({"model": {f"module.{k}": torch.from_numpy(v)
                          for k, v in sd.items()}}, wrapped_path)
    import jax

    direct = load_vinvl_checkpoint(str(direct_path), cfg)
    wrapped = load_vinvl_checkpoint(str(wrapped_path), cfg)
    for a, b in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(wrapped)):
        np.testing.assert_array_equal(a, b)


def test_suffix_aligner_bert_and_mismatch_skip():
    from cpt_tpu.config.bert import tiny_bert_config
    from cpt_tpu.utils.convert import (align_state_dict,
                                       convert_bert_state_dict,
                                       random_oscar_state_dict)

    cfg = tiny_bert_config()
    sd = random_oscar_state_dict(cfg)
    wrapped = {f"module.{k}": v for k, v in sd.items()}
    params = convert_bert_state_dict(wrapped, cfg)
    ref = convert_bert_state_dict(sd, cfg)
    emb = params["bert"]["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(
        emb, ref["bert"]["embeddings"]["word_embeddings"]["embedding"])

    # shape-mismatched entries are skipped, exact match preferred
    expected = {"a.weight": np.zeros((2, 2)), "b.weight": np.zeros((3,))}
    loaded = {"prefix.a.weight": np.ones((2, 2)),
              "b.weight": np.ones((5,))}
    out = align_state_dict(loaded, expected)
    assert "a.weight" in out and "b.weight" not in out
