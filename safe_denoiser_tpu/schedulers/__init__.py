from .ddpm import DDPMScheduler
from .ddim import DDIMScheduler
from .flow_match import FlowMatchEulerScheduler

__all__ = ["DDPMScheduler", "DDIMScheduler", "FlowMatchEulerScheduler"]
