"""Consensus (POA-replacement) tests."""

import numpy as np
import pytest

from fslr_tpu.config import ConsensusConfig, ScoringConfig
from fslr_tpu.encode import decode, encode
from fslr_tpu.ops import banded, poa
from tests.oracles import mutate, random_seq

CFG = ConsensusConfig()


def test_identical_members_consensus_is_backbone():
    rng = np.random.default_rng(0)
    seq = decode(random_seq(rng, 600))
    cons = poa.consensus_sequences([[seq] * 5], CFG, backend='jax')
    assert cons[0] == seq


def test_consensus_recovers_original():
    rng = np.random.default_rng(1)
    original = random_seq(rng, 500)
    members = [decode(mutate(rng, original, sub=0.05, indel=0.02))
               for _ in range(9)]
    cons = poa.consensus_sequences([members], CFG, backend='jax')[0]
    assert abs(len(cons) - 500) < 25
    # consensus must align to the original near-perfectly
    q = np.full((1, 512), 4, np.uint8)
    q[0, :500] = original
    cc = encode(cons)
    w = np.full((1, 512 + 256), 4, np.uint8)
    w[0, 64:64 + len(cc)] = cc[:512 + 192]
    score, _, _ = banded.banded_sw(
        q, w, np.array([500], np.int32),
        ScoringConfig(gap_open_is_first_base=False), backend='jax')
    assert float(score[0]) >= 0.93 * 1000, float(score[0])
    # and be much closer than a typical member
    qm = np.full((1, 512), 4, np.uint8)
    mm = encode(members[0])
    w2 = np.full((1, 512 + 256), 4, np.uint8)
    w2[0, 64:64 + len(mm)] = mm[:512 + 192]
    mscore, _, _ = banded.banded_sw(
        q, w2, np.array([500], np.int32),
        ScoringConfig(gap_open_is_first_base=False), backend='jax')
    assert float(score[0]) > float(mscore[0])


def test_multiple_clusters_batched():
    rng = np.random.default_rng(2)
    clusters = []
    originals = []
    for _ in range(3):
        orig = random_seq(rng, 400)
        originals.append(orig)
        clusters.append([decode(mutate(rng, orig, sub=0.04, indel=0.01))
                        for _ in range(5)])
    clusters.append([])          # empty cluster -> ''
    cons = poa.consensus_sequences(clusters, CFG, backend='jax')
    assert cons[3] == ''
    for c, orig in zip(cons[:3], originals):
        assert abs(len(c) - 400) < 20
