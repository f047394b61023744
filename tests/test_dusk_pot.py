"""Dusk powers-of-tau import (models/dusk_pot.py).

Synthetic transcripts with a known tau exercise the full path: arkworks
point (de)serialization round trips (both encodings), digest pinning,
generator checks, batched same-ratio transcript validation, and seeding
the MPC phase-1 accumulator (the reference's dusk_backed_mpc_setup flow)."""

import hashlib

import numpy as np
import pytest

from tokamak_zk_evm_tpu.fields import Q_MOD, R_MOD
from tokamak_zk_evm_tpu.host import curve as C
from tokamak_zk_evm_tpu.models import dusk_pot as D

TAU = 0xDEADBEEF12345678
N = 4  # tokamak domain size for the test transcript (10n+1 G1 powers)


def _write_transcript(path, compressed, tau=TAU, n=N, corrupt_index=None):
    g1_len, g2_len = 10 * n + 1, 8 * n + 1
    out = bytearray(D.DUSK_HASH_BYTES)  # zero hash header
    acc = 1
    for i in range(g1_len):
        p = C.g1_scalar_mul_affine(C.G1.gen, acc)
        if i == corrupt_index:
            p = C.g1_scalar_mul_affine(C.G1.gen, acc + 1)
        out += D.g1_to_bytes(p, compressed)
        acc = acc * tau % R_MOD
    acc = 1
    for _ in range(g2_len):
        out += D.g2_to_bytes(C.g2_scalar_mul_affine(C.G2.gen, acc),
                             compressed)
        acc = acc * tau % R_MOD
    with open(path, "wb") as f:
        f.write(out)
    return {"g1_len": g1_len, "g2_len": g2_len}


@pytest.mark.parametrize("compressed", [False, True])
def test_point_serialization_roundtrip(compressed):
    rng = np.random.default_rng(3)
    for _ in range(5):
        k = int.from_bytes(rng.bytes(16), "little")
        p1 = C.g1_scalar_mul_affine(C.G1.gen, k)
        assert D.g1_from_bytes(D.g1_to_bytes(p1, compressed), compressed) == p1
        q = C.g2_scalar_mul_affine(C.G2.gen, k)
        assert D.g2_from_bytes(D.g2_to_bytes(q, compressed), compressed) == q
    assert D.g1_from_bytes(D.g1_to_bytes(None, compressed), compressed) is None


@pytest.mark.parametrize("compressed", [False, True])
def test_read_and_validate(tmp_path, compressed):
    path = str(tmp_path / "pot.bin")
    layout = _write_transcript(path, compressed)
    src = D.read_dusk_pot(path, N, expected_sha256=None, file_layout=layout)
    assert src.g1() == C.G1.gen and src.g2() == C.G2.gen
    assert src.x_g2() == C.g2_scalar_mul_affine(C.G2.gen, TAU)
    # alpha = tau^(2n)
    a1 = src.alpha_g2(1)
    assert a1 == C.g2_scalar_mul_affine(C.G2.gen, pow(TAU, 2 * N, R_MOD))
    assert src.alphax_g1(2, 3) == C.g1_scalar_mul_affine(
        C.G1.gen, pow(TAU, 4 * N + 3, R_MOD))
    assert src.provenance["transcript_consistency_verified"]


def test_digest_pin_enforced(tmp_path):
    path = str(tmp_path / "pot.bin")
    layout = _write_transcript(path, False)
    with open(path, "rb") as f:
        actual = hashlib.sha256(f.read()).hexdigest()
    # wrong pin rejects
    with pytest.raises(D.DuskPotError, match="SHA-256 mismatch"):
        D.read_dusk_pot(path, N, expected_sha256="00" * 32,
                        file_layout=layout)
    # correct pin accepts
    D.read_dusk_pot(path, N, expected_sha256=actual, file_layout=layout)


def test_tampered_power_rejected(tmp_path):
    path = str(tmp_path / "pot.bin")
    layout = _write_transcript(path, False, corrupt_index=5)
    with pytest.raises(D.DuskPotError, match="ratio check"):
        D.read_dusk_pot(path, N, expected_sha256=None, file_layout=layout)


def test_seeds_phase1_accumulator(tmp_path):
    import dataclasses

    from tokamak_zk_evm_tpu.models.mpc_setup import Phase1Accumulator
    from tokamak_zk_evm_tpu.models.protocol import SetupParams

    params = SetupParams(l_free=4, l=4, l_user_out=2, l_user=4, l_D=20,
                         m_D=36, n=N, s_D=2, s_max=4)
    # m_i = l_D - l = 16 > n... size the source for max(n, m_i)
    n_src = max(params.n, params.l_D - params.l)
    path = str(tmp_path / "pot.bin")
    layout = _write_transcript(path, False, n=n_src)
    src = D.read_dusk_pot(path, n_src, expected_sha256=None,
                          file_layout=layout)
    acc = Phase1Accumulator.from_dusk(params, src)
    # x_g1[h] = tau^(h+1) G1 and alpha_x cross terms line up
    assert acc.x_g1[0] == C.g1_scalar_mul_affine(C.G1.gen, TAU)
    assert acc.x_g1[2] == C.g1_scalar_mul_affine(C.G1.gen,
                                                 pow(TAU, 3, R_MOD))
    a2x3 = C.g1_scalar_mul_affine(
        C.G1.gen, pow(TAU, 2 * n_src * 2 + 3, R_MOD))
    assert acc.alpha_x_g1[1][2] == a2x3
