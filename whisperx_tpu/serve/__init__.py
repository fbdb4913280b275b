from whisperx_tpu.serve.batching import (
    BatchConfig,
    ContinuousBatcher,
    QueueFullError,
    RequestQueue,
    TranscriptionRequest,
    bucket_requests,
)
from whisperx_tpu.serve.streaming import (
    AudioRingBuffer,
    SpeakerRegistry,
    StreamingChunker,
    StreamingConfig,
    StreamingTranscriber,
    warmup_streaming,
)
from whisperx_tpu.serve.server import TranscriptionServer

__all__ = [
    "TranscriptionServer",
    "BatchConfig",
    "ContinuousBatcher",
    "QueueFullError",
    "RequestQueue",
    "TranscriptionRequest",
    "bucket_requests",
    "AudioRingBuffer",
    "StreamingChunker",
    "SpeakerRegistry",
    "StreamingConfig",
    "StreamingTranscriber",
    "warmup_streaming",
]
