"""Sources: transcript synthesis, readers, and checkpointed sinks."""
