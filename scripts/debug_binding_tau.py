"""Isolate the synthesized-transfer binding failure with the tau identity.

gamma*O_pub_free + eta*O_mid + delta*O_prv (+ the O_pub_fix part)
  == A_free + alpha*U + alpha^2*V + alpha^3*W + alpha^4*B   at fixed tau
(`setup/trusted-setup/src/main.rs:262-292`).  Group-level, no pairings, so
each side's terms can be toggled to find the broken family.
"""

import os
import sys

sys.path.insert(0, ".")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402

from tests.test_synthesizer import (  # noqa: E402
    TRANSFER, SENDER, RECIPIENT, CONTRACT, asm, _slot_key, _transfer_calldata,
)
from tokamak_zk_evm_tpu.fields import R_MOD  # noqa: E402
from tokamak_zk_evm_tpu.testing.real_fixture import REFERENCE_LIBRARY  # noqa: E402
from tokamak_zk_evm_tpu.frontend.synthesizer import Synthesizer, TxEnv  # noqa: E402
from tokamak_zk_evm_tpu.models.setup import Tau, generate_sigma  # noqa: E402
from tokamak_zk_evm_tpu.models.protocol import Mixer  # noqa: E402
from tokamak_zk_evm_tpu.models.prover import Prover  # noqa: E402
from tokamak_zk_evm_tpu.models import prover as PM  # noqa: E402
from tokamak_zk_evm_tpu.host.curve import G1, g1_scalar_mul_affine  # noqa: E402


def main():
    code = asm(TRANSFER)
    key_s, key_r = _slot_key(SENDER, 0), _slot_key(RECIPIENT, 0)
    env = TxEnv(caller=SENDER, address=CONTRACT,
                calldata=_transfer_calldata(RECIPIENT, 250))
    syn = Synthesizer(REFERENCE_LIBRARY, s_max=16)
    res = syn.run(code, env, {key_s: 1000, key_r: 7})
    print("placements:", len(res.placements), flush=True)

    tau = Tau.fixed()
    from tokamak_zk_evm_tpu.io import crs as crs_io
    cache = ".cache/crs_reallib_smax16"
    if os.path.exists(os.path.join(cache, "sigma_meta.json")):
        sigma = crs_io.load_sigma(cache)
    else:
        sigma = generate_sigma(res.params, tau, res.library, res.infos)
        crs_io.save_sigma(sigma, cache)
    print("sigma ready", flush=True)

    p = Prover(res.params, sigma, res.library, res.infos, res.placements,
               res.permutation, res.instance, mixer=Mixer.zero())
    enc = {}
    for name, poly in (("a", p.a_free_X), ("b", p.bXY), ("u", p.uXY),
                       ("v", p.vXY), ("w", p.wXY)):
        enc[name] = PM.encode_poly(sigma, poly, res.params)
        print("encoded", name, flush=True)
    O_inst = PM.encode_O_pub_free(sigma, res.placements, res.infos, res.params)
    O_mid = PM.encode_O_mid_no_zk(sigma, res.placements, res.infos, res.params)
    O_prv = PM.encode_O_prv_no_zk(sigma, res.placements, res.infos, res.params)
    print("O families encoded", flush=True)

    O_fix = PM.encode_O_pub_fix(sigma, res.instance.a_pub_function,
                                res.params)
    a = tau.alpha
    lhs = PM._g1_lincomb((O_inst, tau.gamma), (O_fix, tau.gamma),
                         (O_mid, tau.eta), (O_prv, tau.delta))
    rhs = PM._g1_lincomb(
        (enc["a"], 1), (enc["u"], a), (enc["v"], pow(a, 2, R_MOD)),
        (enc["w"], pow(a, 3, R_MOD)), (enc["b"], pow(a, 4, R_MOD)),
    )
    print("tau identity holds:", lhs == rhs, flush=True)

    # compare each dlog-able piece directly
    for name, poly in (("a_free_X", p.a_free_X), ("bXY", p.bXY),
                       ("uXY", p.uXY)):
        want = g1_scalar_mul_affine(sigma.G, poly.eval(tau.x, tau.y))
        got = enc[name[0]]
        print(f"encode({name}) == G*{name}(tau):", got == want, flush=True)

    # O_pub_free direct dlog check: recompute from per-wire Lagrange evals
    # over the l_free (M) domain: o_inst row g corresponds to the Lagrange
    # basis M_g at tau evaluated on the instance position grid.
    # Instead compare against the INSTANCE side: gamma*O_pub_free should
    # commit exactly the same values the verifier's a_pub poly evaluates.
    inst = res.instance
    m_block = res.params.l_free - res.params.l_user
    vals = [v % R_MOD for v in inst.a_pub_user[:res.params.l_user]]
    vals += [v % R_MOD for v in inst.a_pub_block[:m_block]]
    # placement-side values at the same wires, in gen_a_free_X order
    infos = res.infos
    by_name = {i.name: i for i in infos}
    pl_by_kind = {}
    for pl in res.placements:
        pl_by_kind.setdefault(infos[pl.subcircuit_id].name, []).append(pl)
    side = [None] * res.params.l_free
    for nm, idx_kind in (("bufferPubOut", "Out_idx"), ("bufferPubIn", "In_idx"),
                         ("bufferBlockIn", "In_idx")):
        info = by_name[nm]
        for pl in pl_by_kind.get(nm, []):
            start, cnt = getattr(info, idx_kind)
            for j in range(start, start + cnt):
                g = info.flattenMap[j]
                if g < res.params.l_free:
                    side[g] = pl.variables[j] % R_MOD
    mism = [g for g in range(res.params.l_free)
            if side[g] is not None and side[g] != vals[g]]
    missing = [g for g in range(res.params.l_free) if side[g] is None and vals[g]]
    print("instance-vs-placement mismatched wires:", mism[:10], flush=True)
    print("instance-set-but-no-placement wires:", missing[:10], flush=True)


if __name__ == "__main__":
    main()
