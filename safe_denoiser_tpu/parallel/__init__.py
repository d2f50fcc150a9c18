"""Distribution layer: mesh construction, data-parallel prompt sharding,
tensor-parallel param sharding, sequence-parallel attention, pipeline-
parallel block stack, bank-sharded repellency."""

from .bank import (ShardedBank, pad_bank, shard_bank, sharded_negative_score,
                   sharded_sparse_force)
from .mesh import make_mesh, replicate, shard_batch
from .pp import pp_blocks, shard_stacked_pp, stack_block_params
from .sp import constrain_seq, sp_joint_attention
from .tp import MMDIT_TP_RULES, UNET_TP_RULES, shard_params_tp

__all__ = ["make_mesh", "shard_batch", "replicate", "shard_params_tp",
           "MMDIT_TP_RULES", "UNET_TP_RULES",
           "constrain_seq", "sp_joint_attention",
           "pp_blocks", "stack_block_params", "shard_stacked_pp",
           "pad_bank", "shard_bank", "sharded_negative_score",
           "sharded_sparse_force", "ShardedBank"]
