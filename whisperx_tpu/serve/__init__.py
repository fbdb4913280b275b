from whisperx_tpu.serve.batching import (
    BatchConfig,
    ContinuousBatcher,
    DynamicBatchScheduler,
    RequestQueue,
    TranscriptionRequest,
    bucket_requests,
)
from whisperx_tpu.serve.streaming import (
    AudioRingBuffer,
    StreamingChunker,
    StreamingConfig,
    StreamingTranscriber,
)

__all__ = [
    "BatchConfig",
    "ContinuousBatcher",
    "DynamicBatchScheduler",
    "RequestQueue",
    "TranscriptionRequest",
    "bucket_requests",
    "AudioRingBuffer",
    "StreamingChunker",
    "StreamingConfig",
    "StreamingTranscriber",
]
