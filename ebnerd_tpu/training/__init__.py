from .trainer import Trainer, TrainerConfig, TrainState
from .losses import binary_logloss, categorical_crossentropy, l2_penalty, loss_fn_for
from .checkpoint import CheckpointManager, restore_checkpoint, save_checkpoint
from .inference import chunked_score, split_chunks
