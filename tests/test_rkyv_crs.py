"""rkyv CRS archive layout + round-trip tests.

Byte-layout expectations follow the reference's archived structs
(`libs/src/iotools/mod.rs:1700-1845`) under the rkyv 0.7 wire rules
(ArchivedVec = {i32 rel-ptr, u32 len}; root at end of file)."""

import numpy as np
import pytest

from tokamak_zk_evm_tpu.io import rkyv_crs as RK
from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma
from tokamak_zk_evm_tpu.testing.fixtures import build_fixture


def test_layout_sizes_and_offsets():
    # all candidate layouts agree on struct sizes -> root position is fixed
    for mode in RK.LAYOUT_MODES:
        assert RK.struct_layout("Sigma1Rkyv", mode).size_align == (440, 4)
        assert RK.struct_layout("SigmaRkyv", mode).size_align == (2552, 4)
        assert RK.struct_layout("Sigma2Rkyv", mode).size_align == (1728, 1)
        assert RK.struct_layout("SigmaPreprocessRkyv", mode).size_align == (16, 4)
    lin = RK.struct_layout("SigmaRkyv", "linear").offsets
    assert lin["G"][0] == 0
    assert lin["H"][0] == 96
    assert lin["sigma_1"][0] == 288
    assert lin["sigma_2"][0] == 728
    assert lin["lagrange_KL"][0] == 2456
    ad = RK.struct_layout("SigmaRkyv", "align_desc").offsets
    assert ad["sigma_1"][0] == 0  # align-4 field hoisted first
    assert ad["G"][0] == 440
    s1 = RK.struct_layout("Sigma1Rkyv", "align_desc").offsets
    # 7 vecs (7*8=56) precede the four inline G1 points
    assert s1["xy_powers"][0] == 0
    assert s1["delta_inv_alphak_yi_ty"][0] == 48
    assert s1["x"][0] == 56


@pytest.fixture(scope="module")
def sigma_and_params():
    fx = build_fixture()
    sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)
    return sigma, fx.params


def _families_equal(a, b):
    return (
        np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
        and np.array_equal(np.asarray(a[1]), np.asarray(b[1]))
        and np.array_equal(
            np.asarray(a[2]).astype(bool), np.asarray(b[2]).astype(bool)
        )
    )


@pytest.mark.parametrize("mode", RK.LAYOUT_MODES)
def test_combined_sigma_roundtrip(tmp_path, sigma_and_params, mode):
    sigma, params = sigma_and_params
    path = str(tmp_path / "combined_sigma.rkyv")
    n = RK.write_combined_sigma(sigma, params, path, mode=mode)
    assert n > 2552
    got = RK.read_combined_sigma(path, params)  # auto-detects the mode
    assert got.G == sigma.G
    assert got.H == sigma.H
    assert got.lagrange_KL == sigma.lagrange_KL
    for f in ("x", "y", "delta", "eta"):
        assert getattr(got.sigma_1, f) == getattr(sigma.sigma_1, f)
    for f in ("alpha", "alpha2", "alpha3", "alpha4", "gamma", "delta", "eta",
              "x", "y"):
        assert getattr(got.sigma_2, f) == getattr(sigma.sigma_2, f)
    assert got.sigma_1.delta_inv_alphak_xh_tx == sigma.sigma_1.delta_inv_alphak_xh_tx
    assert got.sigma_1.delta_inv_alpha4_xj_tx == sigma.sigma_1.delta_inv_alpha4_xj_tx
    assert got.sigma_1.delta_inv_alphak_yi_ty == sigma.sigma_1.delta_inv_alphak_yi_ty
    for f in ("xy_powers", "gamma_inv_o_inst", "eta_inv_li_o_inter_alpha4_kj",
              "delta_inv_li_o_prv"):
        assert _families_equal(getattr(got.sigma_1, f), getattr(sigma.sigma_1, f)), f


def test_sigma_preprocess_roundtrip(tmp_path, sigma_and_params):
    sigma, params = sigma_and_params
    path = str(tmp_path / "sigma_preprocess.rkyv")
    RK.write_sigma_preprocess(sigma, params, path)
    xy, gi, h_max, rs_y = RK.read_sigma_preprocess(path, params)
    assert (h_max, rs_y) == (sigma.sigma_1.h_max, sigma.sigma_1.rs_y)
    assert _families_equal(xy, sigma.sigma_1.xy_powers)
    assert _families_equal(gi, sigma.sigma_1.gamma_inv_o_inst)


def test_corrupt_file_rejected(tmp_path, sigma_and_params):
    sigma, params = sigma_and_params
    path = str(tmp_path / "combined_sigma.rkyv")
    RK.write_combined_sigma(sigma, params, path)
    data = bytearray(open(path, "rb").read())
    data[len(data) - 100] ^= 0xFF  # corrupt a root point coordinate
    bad = str(tmp_path / "bad.rkyv")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(RK.RkyvError):
        RK.read_combined_sigma(bad, params)


def test_truncated_and_garbage_files_degrade_gracefully(tmp_path, sigma_and_params):
    """auto mode must raise RkyvError (trying every candidate), never crash
    with a raw ValueError/IndexError from np.frombuffer on malformed input."""
    sigma, params = sigma_and_params
    path = str(tmp_path / "combined_sigma.rkyv")
    RK.write_combined_sigma(sigma, params, path)
    data = open(path, "rb").read()
    cases = {
        "truncated_half": data[: len(data) // 2] + data[-2552:],  # root ok, body cut
        "truncated_tiny": data[:100],
        "garbage": bytes(np.random.default_rng(0).integers(0, 256, len(data), dtype=np.uint8)),
        "zeros": bytes(len(data)),
    }
    for name, blob in cases.items():
        bad = str(tmp_path / f"{name}.rkyv")
        open(bad, "wb").write(blob)
        with pytest.raises(RK.RkyvError):
            RK.read_combined_sigma(bad, params)


def test_prove_on_rkyv_loaded_sigma(tmp_path, sigma_and_params):
    """A CRS that went through the rkyv archive must prove+verify."""
    sigma, params = sigma_and_params
    path = str(tmp_path / "combined_sigma.rkyv")
    RK.write_combined_sigma(sigma, params, path)
    got = RK.read_combined_sigma(path, params)

    from tokamak_zk_evm_tpu.models.preprocess import preprocess
    from tokamak_zk_evm_tpu.models.protocol import Mixer
    from tokamak_zk_evm_tpu.models.prover import Prover
    from tokamak_zk_evm_tpu.models.verifier import Verifier

    fx = build_fixture()
    pre = preprocess(got, fx.permutation, fx.instance, fx.params)
    prover = Prover(fx.params, got, fx.library, fx.infos, fx.placements,
                    fx.permutation, fx.instance, mixer=Mixer.zero())
    proof, _ = prover.prove()
    assert Verifier(fx.params, got, pre, fx.instance, proof,
                    rng=np.random.default_rng(5)).verify_snark()


# ---------------------------------------------------------------------------
# Independent oracle cross-check (io/rkyv_oracle.py): a from-scratch port of
# the reference browser decoder's traversal with hand-computed literal
# offsets — nothing shared with rkyv_crs's layout machinery.
# ---------------------------------------------------------------------------


def test_oracle_cross_validates_primary_writer(tmp_path, sigma_and_params):
    from tokamak_zk_evm_tpu.io import rkyv_oracle as ORC

    sigma, params = sigma_and_params
    path = str(tmp_path / "combined_sigma.rkyv")
    RK.write_combined_sigma(sigma, params, path, mode="align_desc")
    with open(path, "rb") as f:
        buf = f.read()
    payload = ORC.decode_combined_sigma(buf)
    sections = ORC.parse_payload(payload)
    assert len(sections) == 9

    # section 0: G, x, y, delta, eta, lagrange_KL
    s1 = sigma.sigma_1
    want0 = b"".join(
        RK._g1_to_bytes(p)
        for p in (sigma.G, s1.x, s1.y, s1.delta, s1.eta, sigma.lagrange_KL)
    )
    assert sections[0] == want0
    # flat families
    assert sections[1] == RK._g1_family_to_bytes(s1.xy_powers)
    assert sections[2] == RK._g1_family_to_bytes(s1.gamma_inv_o_inst)
    # nested families flatten row-major
    m_i = params.l_D - params.l
    assert len(sections[3]) == m_i * params.s_max * ORC.G1
    assert sections[3][:ORC.G1] == RK._g1_family_to_bytes(
        s1.eta_inv_li_o_inter_alpha4_kj)[:ORC.G1]
    assert len(sections[4]) == (params.m_D - params.l_D) * params.s_max * ORC.G1
    # section 8: H + 9 sigma_2 points
    s2 = sigma.sigma_2
    want8 = b"".join(
        RK._g2_to_bytes(p)
        for p in (sigma.H, s2.alpha, s2.alpha2, s2.alpha3, s2.alpha4,
                  s2.gamma, s2.delta, s2.eta, s2.x, s2.y)
    )
    assert sections[8] == want8


def test_oracle_rejects_garbage():
    import pytest as _pytest

    from tokamak_zk_evm_tpu.io import rkyv_oracle as ORC

    with _pytest.raises(ValueError):
        ORC.decode_combined_sigma(b"not an archive")
