"""Constrained beam search (CBS) — finite-state-machine decoding.

Capability-parity with reference ``Oscar/oscar/utils/cbs.py`` (857 LoC,
Anderson et al.'s constrained beam search used by
``CaptionTSVDatasetWithConstraints``): decoding maintains one beam set per
FSM state; the FSM tracks which constraint words/phrases have been emitted;
the final caption is the best beam among states satisfying at least
``min_constraints_to_satisfy``.

TPU-native: the FSM is a dense ``[num_states, vocab]`` int32 transition
table built host-side from the constraint tries; the search itself is a
fixed-shape scan where each step does a per-target-state masked top-k.
"""
from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


def build_fsm(constraints: Sequence[Sequence[int]], vocab_size: int
              ) -> Tuple[np.ndarray, np.ndarray]:
    """constraints: list of token-id sequences (single- or multi-token).

    Returns (transitions [S, V] int32, num_satisfied [S] int32). Group
    states are the 2^C satisfaction subsets; multi-token constraints add
    chain states from each group state where they are still unsatisfied.
    """
    c = len(constraints)
    n_groups = 1 << c
    states: List[Tuple] = [("g", m) for m in range(n_groups)]
    chain_index = {}
    for ci, toks in enumerate(constraints):
        if len(toks) <= 1:
            continue
        for m in range(n_groups):
            if m & (1 << ci):
                continue
            for depth in range(1, len(toks)):
                chain_index[(ci, m, depth)] = len(states)
                states.append(("c", ci, m, depth))

    s = len(states)
    trans = np.zeros((s, vocab_size), np.int32)
    n_sat = np.zeros((s,), np.int32)

    def group_state(mask):
        return mask  # group states are the first n_groups entries

    for si, st in enumerate(states):
        if st[0] == "g":
            mask = st[1]
            n_sat[si] = bin(mask).count("1")
            trans[si, :] = si  # default: stay
            for ci, toks in enumerate(constraints):
                if mask & (1 << ci) or not toks:
                    continue
                first = toks[0]
                if len(toks) == 1:
                    trans[si, first] = group_state(mask | (1 << ci))
                else:
                    trans[si, first] = chain_index[(ci, mask, 1)]
        else:
            _, ci, mask, depth = st
            n_sat[si] = bin(mask).count("1")
            toks = constraints[ci]
            # default: fall back to the group state (chain broken)
            trans[si, :] = group_state(mask)
            # but other constraints can still start from the group context
            for cj, toks_j in enumerate(constraints):
                if mask & (1 << cj) or not toks_j or cj == ci:
                    continue
                if len(toks_j) == 1:
                    trans[si, toks_j[0]] = group_state(mask | (1 << cj))
                else:
                    trans[si, toks_j[0]] = chain_index[(cj, mask, 1)]
            nxt = toks[depth]
            if depth + 1 == len(toks):
                trans[si, nxt] = group_state(mask | (1 << ci))
            else:
                trans[si, nxt] = chain_index[(ci, mask, depth + 1)]
    return trans, n_sat


def constrained_beam_search(step_logits_fn, params, context, *,
                            transitions: np.ndarray, num_satisfied: np.ndarray,
                            beams_per_state: int, max_len: int,
                            bos_id: int, eos_id: int, pad_id: int,
                            min_constraints: int,
                            length_penalty: float = 1.0,
                            num_group_states: int = 0):
    """Single-image CBS.

    step_logits_fn(params, tokens [N, L], step, *context) → [N, V].
    Returns (tokens [La], score) of the best beam among states with
    ``num_satisfied ≥ min_constraints`` (falls back to the global best).
    ``num_group_states`` > 0 restricts selection to the group
    (satisfaction-subset) states, excluding mid-phrase chain states —
    the reference's ``select_best_beam_with_constraints`` considers only
    ``range(2**num_constraints)`` (``cbs.py:414-419``).
    """
    s = transitions.shape[0]
    k = beams_per_state
    n = s * k
    trans = jnp.asarray(transitions)
    nsat = jnp.asarray(num_satisfied)

    tokens0 = jnp.full((n, max_len), pad_id, jnp.int32).at[:, 0].set(bos_id)
    # beam 0 of state 0 is live; everything else -inf
    scores0 = jnp.full((n,), NEG).at[0].set(0.0)
    state_of0 = jnp.repeat(jnp.arange(s), k)

    def body(carry, step):
        tokens, scores, state_of, finished = carry
        logits = step_logits_fn(params, tokens, step, *context)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        vocab = logp.shape[-1]
        pad_only = jnp.full((vocab,), NEG).at[pad_id].set(0.0)
        logp = jnp.where(finished[:, None], pad_only[None], logp)
        cand = scores[:, None] + logp                        # [N, V]
        # candidate (i, v) lands in state T[state_of[i], v]; finished beams
        # keep their state
        cand_state = jnp.where(finished[:, None], state_of[:, None],
                               trans[state_of])              # [N, V]
        flat = cand.reshape(-1)
        flat_state = cand_state.reshape(-1)

        def pick(s_idx):
            masked = jnp.where(flat_state == s_idx, flat, NEG)
            sc, idx = jax.lax.top_k(masked, k)
            return sc, idx

        sc, idx = jax.vmap(pick)(jnp.arange(s))              # [S, K]
        sc, idx = sc.reshape(-1), idx.reshape(-1)            # [N]
        src = idx // vocab
        tok = (idx % vocab).astype(jnp.int32)
        new_tokens = tokens[src]
        new_finished = finished[src]
        tok = jnp.where(new_finished, pad_id, tok)
        new_tokens = new_tokens.at[:, step].set(tok)
        new_finished = new_finished | (tok == eos_id)
        new_state = jnp.repeat(jnp.arange(s), k)
        return (new_tokens, sc, new_state, new_finished), ()

    init = (tokens0, scores0, state_of0, jnp.zeros((n,), bool))
    (tokens, scores, state_of, _fin), _ = jax.lax.scan(
        body, init, jnp.arange(1, max_len))

    # reference normalization (cbs.py::select_best_beam_with_constraints):
    # score / (count of non-EOS generated tokens + 1) — BOS and the EOS
    # itself excluded from the count
    has_eos = jnp.any(tokens == eos_id, axis=1)
    n_real = (jnp.sum(tokens != pad_id, axis=1) - 1
              - has_eos.astype(jnp.int32)).astype(jnp.float32)
    norm = scores / ((n_real + 1.0) ** length_penalty)
    ok = nsat[state_of] >= min_constraints
    if num_group_states > 0:
        ok = ok & (state_of < num_group_states)
    # the reference considers only beam 0 of each state
    # (cbs.py::select_best_beam_with_constraints indexes
    # beams[i, valid_states, 0, :]); per-state beams here are sorted by
    # raw cumulative score, so beam 0 is slot s*k
    is_beam0 = (jnp.arange(n) % k) == 0
    ok = ok & is_beam0
    sat_norm = jnp.where(ok, norm, NEG)
    best_sat = jnp.argmax(sat_norm)
    best_any = jnp.argmax(jnp.where(is_beam0, norm, NEG))
    use_sat = sat_norm[best_sat] > NEG / 2
    best = jnp.where(use_sat, best_sat, best_any)
    return tokens[best], norm[best]
