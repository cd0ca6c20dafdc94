from minibatch_spark.streaming.api import (  # noqa: F401
    connectdb,
    make_emitter,
    stream,
    streaming,
)
from minibatch_spark.streaming.drain import (  # noqa: F401
    await_condition,
    drain_until_quiet,
)
from minibatch_spark.streaming.join import joined_frame  # noqa: F401
from minibatch_spark.streaming.models import Batcher, Stream  # noqa: F401
from minibatch_spark.streaming.sinks import (  # noqa: F401
    CallableSink,
    IdempotentParquetSink,
    MemorySink,
    ParquetSink,
    StreamSink,
)
from minibatch_spark.streaming.window import (  # noqa: F401
    CountWindow,
    FixedTimeWindow,
    RelaxedTimeWindow,
    Window,
    WindowEmitter,
)
