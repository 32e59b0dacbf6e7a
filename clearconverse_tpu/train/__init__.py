"""Fine-tuning.

The reference only *consumes* fine-tuned checkpoints (whisper-ft /
resepformer-ft overlays, back/api.py:671-692, 727-746) and ships no trainer.
This package closes that loop: a sharded Whisper fine-tune step (teacher
forcing, AdamW) over the same (data, model) mesh the serving path uses, so
ft overlays can be produced in-framework and exported back to the
reference's overlay formats.
"""

from clearconverse_tpu.train.finetune import (  # noqa: F401
    TrainState, make_train_step, whisper_loss, init_train_state)
