"""CLI end-to-end: materialize the toy fixture as reference-layout files,
then drive setup -> preprocess -> prove -> verify through the CLI."""

import os

import pytest

from tokamak_zk_evm_tpu.cli import main
from tokamak_zk_evm_tpu.io import artifacts as art
from tokamak_zk_evm_tpu.testing.fixtures import build_fixture


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    fx = build_fixture()
    lib = str(root / "library")
    synth = str(root / "synthesizer")
    os.makedirs(synth, exist_ok=True)
    art.save_library(lib, fx.params, fx.infos, fx.library)
    art.save_placement_variables(fx.placements, os.path.join(synth, "placementVariables.json"))
    art.save_instance(fx.instance, os.path.join(synth, "instance.json"))
    art.save_permutation(fx.permutation, os.path.join(synth, "permutation.json"))
    return root, lib, synth, fx


def test_library_round_trip(staged):
    _root, lib, _synth, fx = staged
    params, infos, library = art.load_library(lib)
    assert params == fx.params
    assert [i.flattenMap for i in infos] == [i.flattenMap for i in fx.infos]
    for orig, rt in zip(fx.library, library):
        for a, b in ((orig.A_cols, rt.A_cols), (orig.B_cols, rt.B_cols),
                     (orig.C_cols, rt.C_cols)):
            assert {w: sorted(c) for w, c in a.items() if c} == \
                   {w: sorted(c) for w, c in b.items() if c}


def test_cli_pipeline(staged, capsys):
    root, lib, synth, _fx = staged
    crs = str(root / "crs")
    pre = str(root / "pre")
    prf = str(root / "proof")

    assert main(["setup", "--library", lib, "--output", crs, "--fixed-tau"]) == 0
    assert main(["preprocess", "--crs", crs, "--library", lib,
                 "--synthesizer", synth, "--output", pre]) == 0
    assert main(["prove", "--crs", crs, "--library", lib,
                 "--synthesizer", synth, "--output", prf,
                 "--deterministic"]) == 0
    assert os.path.isfile(os.path.join(prf, "proof.json"))
    rc = main(["verify", "--crs", crs, "--library", lib, "--preprocess", pre,
               "--proof", prf, "--synthesizer", synth])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0 and out == "true"


def test_cli_verify_rejects_tampered(staged, capsys):
    root, lib, synth, _fx = staged
    crs = str(root / "crs")
    pre = str(root / "pre")
    prf = str(root / "proof")
    import json

    p = os.path.join(prf, "proof.json")
    with open(p) as f:
        d = json.load(f)
    bad = dict(d)
    # corrupt the final scalar evaluation (V_eval)
    bad["proof_entries_part2"] = list(d["proof_entries_part2"])
    bad["proof_entries_part2"][-1] = "0x" + "01".rjust(64, "0")
    bad_dir = str(root / "proof_bad")
    os.makedirs(bad_dir, exist_ok=True)
    with open(os.path.join(bad_dir, "proof.json"), "w") as f:
        json.dump(bad, f)
    rc = main(["verify", "--crs", crs, "--library", lib, "--preprocess", pre,
               "--proof", bad_dir, "--synthesizer", synth])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 1 and out == "false"


def test_cli_doctor(capsys):
    assert main(["doctor"]) == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "true"


def test_cli_mpc_ceremony(staged, tmp_path, capsys):
    """Full MPC ceremony through the CLI: phase1 init -> contribute -> verify
    -> phase2 prepare -> contribute -> prove+verify on the ceremony CRS."""
    _root, lib, synth, _fx = staged
    out = str(tmp_path)
    a0, a1, p1 = f"{out}/acc0.json", f"{out}/acc1.json", f"{out}/p1.json"
    assert main(["mpc", "phase1-init", "--library", lib, "--output", a0]) == 0
    assert main(["mpc", "phase1-contribute", "--acc", a0, "--output", a1,
                 "--proof", p1]) == 0
    assert main(["mpc", "phase1-verify", "--prev", a0, "--cur", a1,
                 "--proof", p1]) == 0
    crs0, crs1 = f"{out}/crs0", f"{out}/crs1"
    assert main(["mpc", "phase2-prepare", "--acc", a1, "--library", lib,
                 "--y-hex", "0xabc123", "--output", crs0]) == 0
    assert main(["mpc", "phase2-contribute", "--crs", crs0,
                 "--output", crs1]) == 0
    pre, prf = f"{out}/pre", f"{out}/prf"
    assert main(["preprocess", "--crs", crs1, "--library", lib,
                 "--synthesizer", synth, "--output", pre]) == 0
    assert main(["prove", "--crs", crs1, "--library", lib,
                 "--synthesizer", synth, "--output", prf,
                 "--deterministic"]) == 0
    rc = main(["verify", "--crs", crs1, "--library", lib, "--preprocess", pre,
               "--proof", prf, "--synthesizer", synth])
    out_lines = capsys.readouterr().out.strip().splitlines()
    assert rc == 0 and out_lines[-1] == "true"


def test_library_resolution(staged, monkeypatch):
    """Embedded-library resolution chain (reference subcircuit_library.rs)."""
    _root, lib, _synth, _fx = staged
    from tokamak_zk_evm_tpu.io.subcircuit_library import resolve_library_path

    assert resolve_library_path(lib) == os.path.realpath(lib)
    monkeypatch.setenv("TZK_SUBCIRCUIT_LIBRARY", lib)
    assert resolve_library_path(None) == os.path.realpath(lib)
    monkeypatch.delenv("TZK_SUBCIRCUIT_LIBRARY")
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        resolve_library_path(None)  # no embedded library in the repo build
    with _pytest.raises(FileNotFoundError):
        resolve_library_path("/tmp")


def test_sigma_verify_roundtrip(staged, tmp_path):
    _root, lib, _synth, fx = staged
    from tokamak_zk_evm_tpu.io import artifacts as art
    from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma

    sigma = generate_sigma(fx.params, Tau.fixed(), fx.library, fx.infos)
    path = str(tmp_path / "sigma_verify.json")
    art.save_sigma_verify(sigma, path)
    got = art.load_sigma_verify(path)
    assert got.G == sigma.G and got.H == sigma.H
    assert got.lagrange_KL == sigma.lagrange_KL
    assert got.sigma_1.x == sigma.sigma_1.x and got.sigma_1.y == sigma.sigma_1.y
    for k in art._S2_FIELDS:
        assert getattr(got.sigma_2, k) == getattr(sigma.sigma_2, k), k


def test_extract_proof_bundle(tmp_path):
    import json
    import zipfile

    from tokamak_zk_evm_tpu.cli import main

    sdir, pdir, vdir = tmp_path / "s", tmp_path / "p", tmp_path / "v"
    for d, name in ((sdir, "instance.json"), (pdir, "preprocess.json"),
                    (vdir, "proof.json")):
        d.mkdir(exist_ok=True)
        (d / name).write_text(json.dumps({"name": name}))
    out = tmp_path / "bundle.zip"
    rc = main([
        "extract-proof", "--synthesizer", str(sdir), "--preprocess",
        str(pdir), "--prove", str(vdir), "--output", str(out),
    ])
    assert rc == 0
    with zipfile.ZipFile(out) as z:
        assert sorted(z.namelist()) == [
            "instance.json", "preprocess.json", "proof.json"]
