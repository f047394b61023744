"""Command-line pipeline driver — the framework's `tokamak-cli` equivalent.

Mirrors the reference CLI's stage commands (`packages/cli/src/cli.ts:122-171`)
and backend binaries (`packages/backend/README.md:6-14`) over the same file
contract:

    python -m tokamak_zk_evm_tpu setup      --library DIR --output DIR [--fixed-tau]
    python -m tokamak_zk_evm_tpu preprocess --crs DIR --library DIR --synthesizer DIR --output DIR
    python -m tokamak_zk_evm_tpu prove      --crs DIR --library DIR --synthesizer DIR --output DIR [--deterministic]
    python -m tokamak_zk_evm_tpu verify     --crs DIR --library DIR --preprocess DIR --proof DIR --synthesizer DIR
    python -m tokamak_zk_evm_tpu doctor

`--synthesizer DIR` holds the synthesizer outputs (`placementVariables.json`,
`instance.json`, `permutation.json` — `synthesizer/README.md:26-41`);
`--library DIR` is a qap-compiler library dir (`subcircuits/library` layout).
`verify` prints `true`/`false` like the reference verifier (`verify-rust/
src/main.rs`).  `install` prepares a local workspace (library + optional
local trusted setup + provenance digests; there is no runtime download —
JAX is the device backend), `synthesize` replays a tx snapshot directory,
and `extract-proof` bundles the proof artifacts into one zip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _resolve_library(args) -> str:
    from .io.subcircuit_library import resolve_library_path

    return resolve_library_path(args.library)


def _load_synthesizer_outputs(d: str):
    from .io import artifacts as art

    placements = art.load_placement_variables(os.path.join(d, "placementVariables.json"))
    instance = art.load_instance(os.path.join(d, "instance.json"))
    permutation = art.load_permutation(os.path.join(d, "permutation.json"))
    return placements, instance, permutation


def cmd_synthesize(args) -> int:
    """Replay a transaction snapshot into circuit artifacts — the
    reference's `tokamak-cli --synthesize` stage (`cli/src/cli.ts:122-171`,
    input contract `core/src/app/synthesize.ts:31`)."""
    from .frontend.snapshot import synthesize_from_snapshot
    from .io import artifacts as art

    t0 = time.time()
    res = synthesize_from_snapshot(
        args.input, _resolve_library(args), s_max=args.s_max)
    _log(f"[synthesize] replay done in {time.time() - t0:.1f}s: "
         f"{len(res.placements)} placements, "
         f"{len(res.permutation)} permutation entries"
         + (" (REVERTED)" if res.reverted else ""))
    os.makedirs(args.output, exist_ok=True)
    art.save_placement_variables(
        res.placements, os.path.join(args.output, "placementVariables.json"))
    art.save_instance(res.instance, os.path.join(args.output, "instance.json"))
    art.save_permutation(
        res.permutation, os.path.join(args.output, "permutation.json"))
    _log(f"[synthesize] artifacts written to {args.output}")
    return 0


def cmd_install(args) -> int:
    """Prepare a local runtime workspace — the network-free equivalent of
    the reference's `--install` (`cli/src/cli.ts:122-131`,
    `runtime.ts:1046-1120`): materialize the subcircuit library, optionally
    generate the CRS locally (the reference's `--trusted-setup` mode; the
    published-archive download path has no counterpart in this offline
    environment), and record SHA-256 provenance digests."""
    import hashlib

    ws = args.workspace
    os.makedirs(ws, exist_ok=True)
    lib_src = _resolve_library(args)
    lib_dst = os.path.join(ws, "subcircuit-library")
    if os.path.abspath(lib_src) != os.path.abspath(lib_dst):
        import shutil

        shutil.copytree(lib_src, lib_dst, dirs_exist_ok=True)
    _log(f"[install] subcircuit library at {lib_dst}")

    digests = {}
    if not args.no_setup:
        setup_dir = os.path.join(ws, "setup")
        ns = argparse.Namespace(
            library=lib_dst, output=setup_dir, fixed_tau=args.fixed_tau,
            format="both",
        )
        rc = cmd_setup(ns)
        if rc:
            return rc
        for name in sorted(os.listdir(setup_dir)):
            p = os.path.join(setup_dir, name)
            if os.path.isfile(p):
                with open(p, "rb") as f:
                    digests[name] = hashlib.sha256(f.read()).hexdigest()
    prov = os.path.join(ws, "crs_provenance.json")
    with open(prov, "w") as f:
        json.dump({"artifacts": digests}, f, indent=1)
    _log(f"[install] provenance digests written to {prov}")
    return 0


def cmd_extract_proof(args) -> int:
    """Bundle the proof artifacts into one zip — the reference's
    `--extract-proof` (`cli/src/cli.ts:111-121,364-367`): instance.json,
    preprocess.json, proof.json (+ proof4_test.json when present)."""
    import zipfile

    required = [
        (args.synthesizer, "instance.json"),
        (args.preprocess, "preprocess.json"),
        (args.prove, "proof.json"),
    ]
    optional = [(args.prove, "proof4_test.json")]
    with zipfile.ZipFile(args.output, "w", zipfile.ZIP_DEFLATED) as z:
        for d, name in required:
            p = os.path.join(d, name)
            if not os.path.exists(p):
                _log(f"[extract-proof] missing required {p}")
                return 1
            z.write(p, name)
        for d, name in optional:
            p = os.path.join(d, name)
            if os.path.exists(p):
                z.write(p, name)
    _log(f"[extract-proof] bundle written to {args.output}")
    return 0


def cmd_setup(args) -> int:
    from .io import artifacts as art, crs
    from .models.setup import Tau, generate_sigma

    params, infos, library = art.load_library(_resolve_library(args))
    if args.fixed_tau:
        tau = Tau.fixed()
    else:
        from .utils.rng import secure_rng

        tau = Tau.random(secure_rng())
    t0 = time.time()
    sigma = generate_sigma(params, tau, library, infos)
    _log(f"[setup] sigma generated in {time.time() - t0:.1f}s")
    fmt = args.format
    if fmt in ("npz", "both"):
        crs.save_sigma(sigma, args.output)
    if fmt in ("rkyv", "both"):
        from .io import rkyv_crs

        n1 = rkyv_crs.write_combined_sigma(
            sigma, params, os.path.join(args.output, "combined_sigma.rkyv")
        )
        n2 = rkyv_crs.write_sigma_preprocess(
            sigma, params, os.path.join(args.output, "sigma_preprocess.rkyv")
        )
        _log(f"[setup] rkyv archives: combined={n1}B preprocess={n2}B")
    os.makedirs(args.output, exist_ok=True)
    art.save_sigma_verify(sigma, os.path.join(args.output, "sigma_verify.json"))
    _log(f"[setup] CRS written to {args.output}")
    return 0


def cmd_preprocess(args) -> int:
    from .io import artifacts as art, crs
    from .models.preprocess import preprocess

    # only setupParams + instance/permutation are needed here — skip parsing
    # the 14 R1CS files and placementVariables.json (reference preprocess
    # likewise consumes only the slim sigma_preprocess inputs)
    params = art.load_setup_params(
        os.path.join(_resolve_library(args), "setupParams.json"))
    sigma = crs.load_sigma_any(args.crs, params)
    instance = art.load_instance(os.path.join(args.synthesizer, "instance.json"))
    permutation = art.load_permutation(os.path.join(args.synthesizer, "permutation.json"))
    t0 = time.time()
    pre = preprocess(sigma, permutation, instance, params)
    _log(f"[preprocess] done in {time.time() - t0:.1f}s")
    os.makedirs(args.output, exist_ok=True)
    out = os.path.join(args.output, "preprocess.json")
    art.save_preprocess_solidity(pre, out)
    _log(f"[preprocess] written to {out}")
    return 0


def cmd_prove(args) -> int:
    from .io import artifacts as art, crs
    from .models.protocol import Mixer
    from .models.prover import Prover
    from .utils.rng import secure_rng

    params, infos, library = art.load_library(_resolve_library(args))
    sigma = crs.load_sigma_any(args.crs, params)
    placements, instance, permutation = _load_synthesizer_outputs(args.synthesizer)
    mixer = Mixer.zero() if args.deterministic else Mixer.random(secure_rng())
    t0 = time.time()
    prover = Prover(
        params, sigma, library, infos, placements, permutation, instance,
        mixer=mixer, testing_mode=args.testing_mode,
    )
    proof, proof4t = prover.prove()
    _log(f"[prove] done in {time.time() - t0:.1f}s")
    os.makedirs(args.output, exist_ok=True)
    out = os.path.join(args.output, "proof.json")
    art.save_proof_solidity(proof, out)
    _log(f"[prove] written to {out}")
    if args.testing_mode:
        p4t_out = os.path.join(args.output, "proof4_test.json")
        art.save_proof4test(proof4t, p4t_out)
        _log(f"[prove] testing-mode components written to {p4t_out}")
    return 0


def cmd_verify(args) -> int:
    from .io import artifacts as art, crs
    from .models.verifier import Verifier

    params = art.load_setup_params(
        os.path.join(_resolve_library(args), "setupParams.json"))
    sv = os.path.join(args.crs, "sigma_verify.json")
    if os.path.exists(sv):
        sigma = art.load_sigma_verify(sv)  # slim verifier CRS (reference contract)
    else:
        sigma = crs.load_sigma_any(args.crs, params)
    pre = art.load_preprocess_solidity(os.path.join(args.preprocess, "preprocess.json"))
    proof = art.load_proof_solidity(os.path.join(args.proof, "proof.json"))
    instance = art.load_instance(os.path.join(args.synthesizer, "instance.json"))
    verifier = Verifier(params, sigma, pre, instance, proof)
    ok = verifier.verify_snark()
    # decomposed testing-mode checks when the prover emitted proof4_test.json
    # (`verify-rust/src/lib.rs:291-352`)
    p4t_path = os.path.join(args.proof, "proof4_test.json")
    if os.path.exists(p4t_path):
        p4t = art.load_proof4test(p4t_path)
        for name, fn in (("arith", verifier.verify_arith),
                         ("copy", verifier.verify_copy),
                         ("binding", verifier.verify_binding)):
            res = fn(p4t)
            _log(f"[verify] decomposed {name} check: {res}")
            ok = ok and res
    print("true" if ok else "false")
    return 0 if ok else 1


def cmd_mpc(args) -> int:
    """MPC ceremony flows (reference `native_mpc_setup`,
    `setup/mpc-setup/src/flows/*`)."""
    import json

    from .io import artifacts as art, crs
    from .models import mpc_setup as M
    from .utils.rng import secure_rng

    step = args.step
    if step == "phase1-init":
        params = art.load_setup_params(
        os.path.join(_resolve_library(args), "setupParams.json"))
        acc = M.Phase1Accumulator.initial(params)
        acc.save(args.output)
        _log(f"[mpc] initial phase-1 accumulator -> {args.output}")
        return 0
    if step == "phase1-contribute":
        acc = M.Phase1Accumulator.load(args.acc)
        new_acc, proof = acc.compute(secure_rng())
        new_acc.save(args.output)
        with open(args.proof, "w") as f:
            json.dump(proof.to_json(), f)
        _log(f"[mpc] contribution #{new_acc.contributor_index} -> "
             f"{args.output} (proof {args.proof})")
        return 0
    if step == "phase1-verify":
        prev = M.Phase1Accumulator.load(args.prev)
        cur = M.Phase1Accumulator.load(args.cur)
        with open(args.proof) as f:
            proof = M.Phase1Proof.from_json(json.load(f))
        ok = prev.verify(cur, proof)
        print("true" if ok else "false")
        return 0 if ok else 1
    if step == "phase2-prepare":
        params, infos, library = art.load_library(_resolve_library(args))
        acc = M.Phase1Accumulator.load(args.acc)
        y = int(args.y_hex, 16)
        sigma = M.phase2_prepare(acc, y, params, library, infos)
        crs.save_sigma(sigma, args.output)
        _log(f"[mpc] phase-2 prepared CRS (gamma=delta=eta=1) -> {args.output}")
        return 0
    if step == "phase2-contribute":
        sigma = crs.load_sigma(args.crs)
        new_sigma, proof = M.phase2_contribute(sigma, secure_rng())
        crs.save_sigma(new_sigma, args.output)
        with open(os.path.join(args.output, "phase2_proof.json"), "w") as f:
            json.dump(proof.to_json(), f)
        _log(f"[mpc] phase-2 contribution -> {args.output}")
        return 0
    raise SystemExit(f"unknown mpc step {step}")


def cmd_doctor(_args) -> int:
    """Health check (`tokamak-cli --doctor`): platform, devices, kernels."""
    import jax

    devs = jax.devices()
    _log(f"[doctor] jax {jax.__version__}; platform={devs[0].platform}; devices={len(devs)}")
    from .backend.api import backend_kind

    _log(f"[doctor] compute backend: {backend_kind()}")
    from .fields import R_MOD
    from .ops import field as F
    import numpy as np

    a = F.pack_fr([R_MOD - 1])
    out = int(np.asarray(F.unpack_fr(np.asarray(F.fr_mul(a, a))))[0])
    ok = out == 1
    _log(f"[doctor] field self-test (r-1)^2 == 1: {ok}")
    print("true" if ok else "false")
    return 0 if ok else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tokamak_zk_evm_tpu",
        description="TPU-native Tokamak zk-SNARK pipeline",
    )
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser(
        "install",
        help="prepare a local runtime workspace (library + optional local "
             "trusted setup + provenance digests)")
    s.add_argument("--workspace", required=True)
    s.add_argument("--library", help="subcircuit library dir (optional when embedded or TZK_SUBCIRCUIT_LIBRARY is set)")
    s.add_argument("--no-setup", action="store_true",
                   help="skip CRS generation")
    s.add_argument("--fixed-tau", action="store_true")
    s.set_defaults(fn=cmd_install)

    s = sub.add_parser(
        "extract-proof",
        help="bundle instance/preprocess/proof JSON into one zip")
    s.add_argument("--synthesizer", required=True)
    s.add_argument("--preprocess", required=True)
    s.add_argument("--prove", required=True)
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_extract_proof)

    s = sub.add_parser(
        "synthesize",
        help="replay a tx snapshot into circuit artifacts "
             "(previous_state_snapshot/transaction/block_info/contract_codes"
             ".json)")
    s.add_argument("--input", required=True,
                   help="directory with the 4 snapshot input JSON files")
    s.add_argument("--library", help="subcircuit library dir (optional when embedded or TZK_SUBCIRCUIT_LIBRARY is set)")
    s.add_argument("--output", required=True)
    s.add_argument("--s-max", type=int, default=256,
                   help="placement budget (power of two, default 256)")
    s.set_defaults(fn=cmd_synthesize)

    s = sub.add_parser("setup", help="generate the CRS (trusted setup)")
    s.add_argument("--library", help="subcircuit library dir (optional when embedded or TZK_SUBCIRCUIT_LIBRARY is set)")
    s.add_argument("--output", required=True)
    s.add_argument("--fixed-tau", action="store_true",
                   help="deterministic trapdoor (testing only; matches the reference's --fixed-tau)")
    s.add_argument("--format", choices=("npz", "rkyv", "both"), default="both",
                   help="CRS artifact format: npz (native), rkyv "
                        "(reference combined_sigma.rkyv/sigma_preprocess.rkyv), or both")
    s.set_defaults(fn=cmd_setup)

    s = sub.add_parser("preprocess", help="commit permutation polynomials")
    s.add_argument("--crs", required=True)
    s.add_argument("--library", help="subcircuit library dir (optional when embedded or TZK_SUBCIRCUIT_LIBRARY is set)")
    s.add_argument("--synthesizer", required=True)
    s.add_argument("--output", required=True)
    s.set_defaults(fn=cmd_preprocess)

    s = sub.add_parser("prove", help="generate a proof")
    s.add_argument("--crs", required=True)
    s.add_argument("--library", help="subcircuit library dir (optional when embedded or TZK_SUBCIRCUIT_LIBRARY is set)")
    s.add_argument("--synthesizer", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--deterministic", action="store_true",
                   help="zero blinding scalars (bit-exact proofs for testing)")
    s.add_argument("--testing-mode", action="store_true",
                   help="run in-round protocol identity asserts and emit "
                        "proof4_test.json (reference --features testing-mode)")
    s.set_defaults(fn=cmd_prove)

    s = sub.add_parser("verify", help="verify a proof")
    s.add_argument("--crs", required=True)
    s.add_argument("--library", help="subcircuit library dir (optional when embedded or TZK_SUBCIRCUIT_LIBRARY is set)")
    s.add_argument("--preprocess", required=True)
    s.add_argument("--proof", required=True)
    s.add_argument("--synthesizer", required=True)
    s.set_defaults(fn=cmd_verify)

    s = sub.add_parser("mpc", help="MPC setup ceremony (powers-of-tau)")
    s.add_argument("step", choices=(
        "phase1-init", "phase1-contribute", "phase1-verify",
        "phase2-prepare", "phase2-contribute",
    ))
    s.add_argument("--library")
    s.add_argument("--acc")
    s.add_argument("--prev")
    s.add_argument("--cur")
    s.add_argument("--proof")
    s.add_argument("--crs")
    s.add_argument("--y-hex", help="public beacon value for y (phase2-prepare)")
    s.add_argument("--output")
    s.set_defaults(fn=cmd_mpc)

    s = sub.add_parser("doctor", help="environment health check")
    s.set_defaults(fn=cmd_doctor)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
