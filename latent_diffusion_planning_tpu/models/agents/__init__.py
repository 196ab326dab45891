from .dp import DPAgent
from .dp_vae import DPVAEAgent
from .ldp import LDPAgent
from .ldp_hier import LDPHierAgent

__all__ = ["DPAgent", "DPVAEAgent", "LDPAgent", "LDPHierAgent"]
