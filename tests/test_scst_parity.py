"""SCST parity against the reference's own ``ScstRewardCriterion``
(``Oscar/oscar/utils/caption_evaluate.py:115-185``) executed directly.

Two layers:
  * REINFORCE math — the reference criterion is run with its CIDEr scorer
    stubbed to fixed rewards, so its baseline/advantage/loss code is
    exercised verbatim and compared to ``scst_advantages`` + our loss
    formula, for both ``greedy`` and leave-one-out ``sample`` baselines.
  * CIDEr-D rewards — our pure-python ``utils/cider.py`` scorer vs the
    reference's vendored ``pyciderevalcap`` CiderD in corpus-df mode on
    the same (eos-wrapped) corpus.

The reference file imports the absent ``coco_caption`` submodule; minimal
stubs are installed (same pattern as ``tests/reference_stubs.py``).
"""
import sys
import types

import numpy as np
import pytest
import torch

OSCAR_ROOT = "/root/reference/Oscar"


def _import_reference_criterion():
    if OSCAR_ROOT not in sys.path:
        sys.path.insert(0, OSCAR_ROOT)
    for name, attrs in (
            ("coco_caption", {}),
            ("coco_caption.pycocotools", {}),
            ("coco_caption.pycocotools.coco", {"COCO": object}),
            ("coco_caption.pycocoevalcap", {}),
            ("coco_caption.pycocoevalcap.eval", {"COCOEvalCap": object})):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    from oscar.utils.caption_evaluate import ScstRewardCriterion
    return ScstRewardCriterion


GT = [["a red dog sits", "the red dog sits down"],
      ["a blue cat sleeps", "the cat sleeps"]]
GREEDY = ["a red dog", "a cat sleeps"]
SAMPLES = ["the red dog sits", "a dog", "the cat sleeps well", "blue cat"]
SEQ_PER_IMG = 2


@pytest.mark.parametrize("baseline_type", ["greedy", "sample"])
def test_reinforce_math_matches_reference(baseline_type):
    """Fixed rewards → identical loss from the reference criterion and
    from scst_advantages + (-mean(adv * logp))."""
    from cpt_tpu.engine.scst import scst_advantages

    ScstRewardCriterion = _import_reference_criterion()
    crit = ScstRewardCriterion.__new__(ScstRewardCriterion)
    torch.nn.Module.__init__(crit)
    crit.baseline_type = baseline_type
    crit._cur_score = None

    rng = np.random.RandomState(0)
    n_gen = len(SAMPLES) + (len(GREEDY) if baseline_type == "greedy" else 0)
    fixed = rng.uniform(0.0, 2.0, n_gen).astype(np.float32)
    crit._calculate_eval_scores = lambda gen_res, gt_idx, gt_res: fixed[
        : len(gen_res)]

    logprobs = torch.tensor(rng.uniform(-8.0, -0.5, len(SAMPLES)),
                            dtype=torch.float32, requires_grad=True)
    loss_ref = crit(GT, GREEDY if baseline_type == "greedy" else None,
                    SAMPLES, logprobs)

    sample_scores = fixed[: len(SAMPLES)].reshape(-1, SEQ_PER_IMG)
    greedy_scores = (fixed[len(SAMPLES):] if baseline_type == "greedy"
                     else None)
    adv = scst_advantages(sample_scores, greedy_scores, baseline_type)
    ours = -np.mean(adv.reshape(-1) * logprobs.detach().numpy())
    np.testing.assert_allclose(float(loss_ref.detach()), ours, rtol=1e-6)
    # the criterion's running score is the mean raw sample reward
    np.testing.assert_allclose(float(crit.get_score()),
                               sample_scores.mean(), rtol=1e-6)


def test_ciderd_rewards_match_reference_scorer():
    """Our CiderD vs the vendored pyciderevalcap CiderD (df='corpus').

    Conventions matched to the reference criterion's usage
    (caption_evaluate.py:160-185): one gts entry per generated caption
    (so document frequencies count repeated images repeatedly) and
    ``_wrap_sentence``'s ``<eos>`` suffix on every sentence.
    """
    from cpt_tpu.utils.cider import CiderD as OurCiderD

    ScstRewardCriterion = _import_reference_criterion()
    from oscar.utils.cider.pyciderevalcap.ciderD.ciderD import (
        CiderD as RefCiderD)

    wrap = ScstRewardCriterion._wrap_sentence
    gen = SAMPLES + GREEDY
    gt_idx = [i // SEQ_PER_IMG for i in range(len(SAMPLES))] + [0, 1]

    res = [{"image_id": i, "caption": [wrap(g)]} for i, g in enumerate(gen)]
    gts = {i: [wrap(s) for s in GT[gt_idx[i]]] for i in range(len(gen))}
    _, ref_scores = RefCiderD(df="corpus").compute_score(gts, res)

    ours = OurCiderD({str(i): [wrap(s).split() for s in GT[gt_idx[i]]]
                      for i in range(len(gen))})
    our_scores = [ours.score(str(i), wrap(g).split())
                  for i, g in enumerate(gen)]
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-6, atol=1e-8)
