"""Sources, sinks, and the resumable stage checkpoint store."""
