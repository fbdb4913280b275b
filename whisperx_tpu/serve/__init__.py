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
from whisperx_tpu.serve.ws import WebSocket, WSProtocolError

__all__ = [
    "TranscriptionServer",
    "WebSocket",
    "WSProtocolError",
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
