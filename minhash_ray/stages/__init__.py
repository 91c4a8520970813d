"""Ray Data pipeline stages: validate → signature → banding → candidates →
verify → cluster.  Each stage is a batch transform over Arrow batches;
stateful stages are callable classes run as actor pools."""
