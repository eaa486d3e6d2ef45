"""The reference's three example applications, rebuilt on this engine:
word-count (examples/word-count), stream-sum (examples/stream-sum),
bike-share (examples/bike-share). Each is a thin composition of the
engine's operators — journals, shard runner, sequencer, windows —
demonstrating that a user of the reference's examples can run the same
pipelines here."""
