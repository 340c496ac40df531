"""Named PCD configurations — the framework's counterpart of the five
reference test configs (tests/mnt4_groth16.rs:22-30, mnt4_gm17.rs:23-31,
mnt4_mix_*.rs:24-32, mnt4_marlin.rs:68-94), plus toy-cycle variants used by
the fast test suite.

Each factory returns an ECCyclePCDConfig wiring the Bowe-Hopwood CRH with a
(main, help) SNARK pair over the chosen cycle.
"""

from __future__ import annotations

from functools import lru_cache

from .crh.bowe_hopwood import BoweHopwoodCRH
from .curves import models as M
from .pcd.ec_cycle import ECCyclePCD, ECCyclePCDConfig
from .snark.groth16.gadget import Groth16VerifierGadget
from .snark.groth16.native import Groth16


def _groth16_config(cycle) -> ECCyclePCDConfig:
    return ECCyclePCDConfig(
        cycle=cycle,
        crh=BoweHopwoodCRH(cycle.crh_te),
        main_snark=Groth16(cycle.main),
        help_snark=Groth16(cycle.help),
        main_gadget=Groth16VerifierGadget(cycle.main),
        help_gadget=Groth16VerifierGadget(cycle.help),
    )


@lru_cache(maxsize=None)
def toy_groth16() -> ECCyclePCD:
    """Toy-cycle Groth16 PCD (fast tests)."""
    return ECCyclePCD(_groth16_config(M.toy_cycle()))


@lru_cache(maxsize=None)
def mnt4_groth16() -> ECCyclePCD:
    """The reference's PCDGroth16Mnt4 (tests/mnt4_groth16.rs:22-30):
    Groth16<MNT4-298> main / Groth16<MNT6-298> help, Bowe-Hopwood CRH."""
    return ECCyclePCD(_groth16_config(M.mnt_cycle()))


def _gm17_config(cycle, main_kind: str, help_kind: str) -> ECCyclePCDConfig:
    from .snark.gm17.gadget import GM17VerifierGadget
    from .snark.gm17.native import GM17

    def mk(kind, curve):
        if kind == "groth16":
            return Groth16(curve), Groth16VerifierGadget(curve)
        return GM17(curve), GM17VerifierGadget(curve)

    main_snark, main_gadget = mk(main_kind, cycle.main)
    help_snark, help_gadget = mk(help_kind, cycle.help)
    return ECCyclePCDConfig(
        cycle=cycle,
        crh=BoweHopwoodCRH(cycle.crh_te),
        main_snark=main_snark,
        help_snark=help_snark,
        main_gadget=main_gadget,
        help_gadget=help_gadget,
    )


@lru_cache(maxsize=None)
def toy_gm17() -> ECCyclePCD:
    return ECCyclePCD(_gm17_config(M.toy_cycle(), "gm17", "gm17"))


@lru_cache(maxsize=None)
def mnt4_gm17() -> ECCyclePCD:
    """Reference PCDGm17Mnt4 (tests/mnt4_gm17.rs:23-31)."""
    return ECCyclePCD(_gm17_config(M.mnt_cycle(), "gm17", "gm17"))


@lru_cache(maxsize=None)
def toy_mix_groth16_gm17() -> ECCyclePCD:
    return ECCyclePCD(_gm17_config(M.toy_cycle(), "groth16", "gm17"))


@lru_cache(maxsize=None)
def toy_mix_gm17_groth16() -> ECCyclePCD:
    return ECCyclePCD(_gm17_config(M.toy_cycle(), "gm17", "groth16"))


@lru_cache(maxsize=None)
def mnt4_mix_groth16_gm17() -> ECCyclePCD:
    """Reference tests/mnt4_mix_groth16gm17.rs:24-32."""
    return ECCyclePCD(_gm17_config(M.mnt_cycle(), "groth16", "gm17"))


@lru_cache(maxsize=None)
def mnt4_mix_gm17_groth16() -> ECCyclePCD:
    """Reference tests/mnt4_mix_gm17groth16.rs:24-32."""
    return ECCyclePCD(_gm17_config(M.mnt_cycle(), "gm17", "groth16"))


def _marlin_config(cycle) -> ECCyclePCDConfig:
    from .snark.marlin.gadget import MarlinVerifierGadget
    from .snark.marlin.native import MarlinSNARK

    return ECCyclePCDConfig(
        cycle=cycle,
        crh=BoweHopwoodCRH(cycle.crh_te),
        main_snark=MarlinSNARK(cycle.main),
        help_snark=MarlinSNARK(cycle.help),
        main_gadget=MarlinVerifierGadget(cycle.main),
        help_gadget=MarlinVerifierGadget(cycle.help),
    )


@lru_cache(maxsize=None)
def toy_marlin() -> ECCyclePCD:
    return ECCyclePCD(_marlin_config(M.toy_cycle()))


@lru_cache(maxsize=None)
def mnt4_marlin() -> ECCyclePCD:
    """Reference PCDMarlin (tests/mnt4_marlin.rs:68-94): Marlin+KZG10 on
    both sides of the cycle, Poseidon Fiat-Shamir, universal setup."""
    return ECCyclePCD(_marlin_config(M.mnt_cycle()))
