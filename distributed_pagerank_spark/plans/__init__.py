"""Plans: the iterative algorithms and their checkpointed fixpoint harness."""
