from whisperx_tpu.convert.checkpoint import (
    is_checkpoint_dir,
    load_checkpoint,
    save_checkpoint,
)

__all__ = ["is_checkpoint_dir", "load_checkpoint", "save_checkpoint"]
