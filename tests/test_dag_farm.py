"""Multi-predecessor DAG PCD + proof farm (BASELINE.json configs[4]:
'multi-predecessor DAG PCD ... node proofs farmed across hosts')."""

import pytest

from pcd_tpu import configs
from pcd_tpu.parallel.farm import DagFarm, ProofDag
from pcd_tpu.pcd.api import FpPredicate
from pcd_tpu.utils.rng import ChaChaRng


class SumPredicate(FpPredicate):
    """Aggregation-tree predicate: msg = prior0 + prior1 + witness
    (PRIOR_MSG_LEN = 2 — exercises DAG fan-in > 1, reference lib.rs:22)."""

    PRIOR_MSG_LEN = 2

    def generate_constraints(self, cs, msg, wit, priors, base):
        assert len(priors) == 2
        (priors[0] + priors[1] + wit).enforce_equal(msg)


def _tree_predicate_builder(F):
    return SumPredicate(F)


@pytest.mark.pcd_toy
def test_binary_tree_dag():
    """A 2-level aggregation tree: 4 leaves -> 2 mids -> root."""
    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = SumPredicate(F)
    rng = ChaChaRng(b"dag test")
    pk, vk = pcd.circuit_specific_setup(pred, rng)

    dag = ProofDag()
    # leaves: base case, msg = witness (priors default to 0)
    for i in range(4):
        dag.add_node(f"leaf{i}", F.from_int(i + 1), F.from_int(i + 1))
    dag.add_node("mid0", F.from_int(1 + 2 + 10), F.from_int(10),
                 priors=["leaf0", "leaf1"])
    dag.add_node("mid1", F.from_int(3 + 4 + 20), F.from_int(20),
                 priors=["leaf2", "leaf3"])
    root_val = (1 + 2 + 10) + (3 + 4 + 20) + 5
    dag.add_node("root", F.from_int(root_val), F.from_int(5),
                 priors=["mid0", "mid1"])

    farm = DagFarm(pcd, pred, pk, workers=1)
    proofs = farm.run(dag)
    assert len(proofs) == 7
    # the root proof transitively attests the whole tree
    assert pcd.verify(vk, pred, F.from_int(root_val), proofs["root"])
    # inner proofs verify against their own messages
    assert pcd.verify(vk, pred, F.from_int(13), proofs["mid0"])
    # and not against others
    assert not pcd.verify(vk, pred, F.from_int(14), proofs["mid0"])


@pytest.mark.slow
def test_farm_multiprocess():
    """2-process farm with pk replication from the config factory — the
    multi-host deployment pattern (only (msg, proof) bytes cross workers)."""
    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = SumPredicate(F)
    seed = b"farm seed"
    pk, vk = pcd.circuit_specific_setup(pred, ChaChaRng(seed))

    dag = ProofDag()
    for i in range(2):
        dag.add_node(f"leaf{i}", F.from_int(i + 1), F.from_int(i + 1))
    dag.add_node("root", F.from_int(1 + 2 + 7), F.from_int(7),
                 priors=["leaf0", "leaf1"])

    farm = DagFarm(pcd, pred, pk, workers=2,
                   config_name="toy_groth16", seed=seed,
                   predicate_builder=_tree_predicate_builder)
    proofs = farm.run(dag)
    assert pcd.verify(vk, pred, F.from_int(10), proofs["root"])


class KillOncePredicate(FpPredicate):
    """Kills its worker process (os._exit) the first time the magic message
    is proved — simulates a mid-wave host failure.  The sentinel file makes
    the failure one-shot so the retry succeeds."""

    PRIOR_MSG_LEN = 2
    MAGIC = 1 + 2 + 10

    def flatten_message(self, msg):
        # disable witness-program replay so every prove re-synthesizes
        # (the kill must trigger inside generate_constraints)
        raise NotImplementedError

    def generate_constraints(self, cs, msg, wit, priors, base):
        import os

        sentinel = os.environ.get("PCD_TPU_TEST_KILL_SENTINEL")
        if sentinel and msg.val == self.MAGIC and not os.path.exists(sentinel):
            with open(sentinel, "w") as f:
                f.write("died")
            os._exit(1)
        (priors[0] + priors[1] + wit).enforce_equal(msg)


def _kill_once_builder(F):
    return KillOncePredicate(F)


@pytest.mark.slow
def test_farm_survives_worker_death(tmp_path, monkeypatch):
    """A worker dying mid-wave poisons the process pool; the farm must
    rebuild the pool, re-run the lost nodes, and still complete the DAG
    (VERDICT round-2 item 10)."""
    import os

    sentinel = str(tmp_path / "kill_once")
    monkeypatch.setenv("PCD_TPU_TEST_KILL_SENTINEL", sentinel)

    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = KillOncePredicate(F)
    seed = b"farm death seed"
    pk, vk = pcd.circuit_specific_setup(pred, ChaChaRng(seed))

    dag = ProofDag()
    for i in range(2):
        dag.add_node(f"leaf{i}", F.from_int(i + 1), F.from_int(i + 1))
    dag.add_node("mid", F.from_int(KillOncePredicate.MAGIC), F.from_int(10),
                 priors=["leaf0", "leaf1"])

    farm = DagFarm(pcd, pred, pk, workers=2,
                   config_name="toy_groth16", seed=seed,
                   predicate_builder=_kill_once_builder)
    proofs = farm.run(dag)
    assert os.path.exists(sentinel), "kill never triggered"
    assert pcd.verify(vk, pred, F.from_int(KillOncePredicate.MAGIC),
                      proofs["mid"])


class Counter1(FpPredicate):
    PRIOR_MSG_LEN = 1

    def generate_constraints(self, cs, msg, wit, priors, base):
        (priors[0] + wit).enforce_equal(msg)


@pytest.mark.pcd_toy
def test_pipelined_chain_prover():
    from pcd_tpu.parallel.pipeline import PipelinedChainProver

    pcd = configs.toy_groth16()
    F = pcd.ic.main_field
    pred = Counter1(F)
    pk, vk = pcd.circuit_specific_setup(pred, ChaChaRng(b"pipe"))
    msgs = [F.from_int(1), F.from_int(2), F.from_int(3)]
    wits = [F.from_int(1)] * 3
    runner = PipelinedChainProver(pcd, pred, pk)
    proofs = runner.prove_chain(msgs, wits)
    for m, pf in zip(msgs, proofs):
        assert pcd.verify(vk, pred, m, pf)
    assert not pcd.verify(vk, pred, msgs[0], proofs[2])
