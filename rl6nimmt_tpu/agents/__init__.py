"""Agent registry (mirrors /root/reference/rl_6_nimmt/agents/__init__.py)."""

from .acer import BatchedACERAgent, BatchedActionValueActorCriticAgent
from .base import Agent
from .dqn import (
    D3QN_PRB_NStep,
    DDQN_PRBAgent,
    DDQNAgent,
    DQN_NStep_Agent,
    DQN_PRBAgent,
    DQNAgent,
    DQNConfig,
    DQNVanilla,
    DuellingDDQN_PRBAgent,
    DuellingDDQNAgent,
    DuellingDQNAgent,
    Noisy_D3QN,
    Noisy_D3QN_PRB_NStep,
    Noisy_DQN,
)
from .human import Human
from .mcs import (
    BaseMCAgent,
    MCSAgent,
    PolicyMCSAgent,
    PUCTAgent,
    PUCTCustomedAgent,
    PUCTUniformAgent,
)
from .random_agent import DrunkHamster
from .reinforce import BatchedReinforceAgent, MaskedReinforceAgent

HUMAN = "human"
RANDOM_AGENT = "random"
REINFORCE = "reinforce"
ACER = "acer"
DQN = "dqn"
DDQN = "ddqn"
DQN_PRB = "dqn_prb"
DDQN_PRB = "ddqn_prb"
DUELLING_DDQN_PRB = "duelling_ddqn_prb"
DQN_NSTEP = "dqn_nstep"
D3QN_PRB_NSTEP = "d3qn_prb_nstep"
NOISY_DQN = "noisy_dqn"
NOISY_D_QN_PRB_NSTEP = "noisy_d3qn_prb_nstep"
DUELLING_DQN = "duelling_dqn"
DUELLING_DDQN = "duelling_ddqn"
NOISY_D3QN = "noisy_d3qn"
MCS = "mcts"
PMCS = "pmcs"
PUCT = "puct"
# Framework-original (no reference analog): decoupled Alpha0.5, net prior at
# the root only (see agents.mcs.PUCTUniformAgent).  Extends the reference's
# 19-key registry; every reference key keeps its exact meaning.
PUCT_UNIFORM = "puct_uniform"

AGENTS = {
    HUMAN: Human,
    RANDOM_AGENT: DrunkHamster,
    REINFORCE: BatchedReinforceAgent,
    ACER: BatchedACERAgent,
    DQN: DQNVanilla,
    DDQN: DDQNAgent,
    DUELLING_DQN: DuellingDQNAgent,
    DUELLING_DDQN: DuellingDDQNAgent,
    DQN_PRB: DQN_PRBAgent,
    DDQN_PRB: DDQN_PRBAgent,
    DUELLING_DDQN_PRB: DuellingDDQN_PRBAgent,
    DQN_NSTEP: DQN_NStep_Agent,
    D3QN_PRB_NSTEP: D3QN_PRB_NStep,
    NOISY_DQN: Noisy_DQN,
    NOISY_D_QN_PRB_NSTEP: Noisy_D3QN_PRB_NStep,
    NOISY_D3QN: Noisy_D3QN,
    MCS: MCSAgent,
    PMCS: PolicyMCSAgent,
    PUCT: PUCTAgent,
    PUCT_UNIFORM: PUCTUniformAgent,
}

POLICY_METHODS = [REINFORCE, ACER]
DDQN_METHODS = [DDQN, DUELLING_DDQN, DDQN_PRB, DUELLING_DDQN_PRB, NOISY_D_QN_PRB_NSTEP, NOISY_D3QN, D3QN_PRB_NSTEP]
NSTEP_METHODS = [DQN_NSTEP, D3QN_PRB_NSTEP, NOISY_D_QN_PRB_NSTEP]
NOISY_METHODS = [NOISY_DQN, NOISY_D_QN_PRB_NSTEP, NOISY_D3QN]

__all__ = [
    "Agent",
    "AGENTS",
    "BaseMCAgent",
    "BatchedACERAgent",
    "BatchedActionValueActorCriticAgent",
    "BatchedReinforceAgent",
    "D3QN_PRB_NStep",
    "DDQN_PRBAgent",
    "DDQNAgent",
    "DQN_NStep_Agent",
    "DQN_PRBAgent",
    "DQNAgent",
    "DQNConfig",
    "DQNVanilla",
    "DrunkHamster",
    "DuellingDDQN_PRBAgent",
    "DuellingDDQNAgent",
    "DuellingDQNAgent",
    "Human",
    "MCSAgent",
    "MaskedReinforceAgent",
    "Noisy_D3QN",
    "Noisy_D3QN_PRB_NStep",
    "Noisy_DQN",
    "PolicyMCSAgent",
    "PUCTAgent",
    "PUCTCustomedAgent",
    "PUCTUniformAgent",
]
