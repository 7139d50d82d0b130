"""IO: dataset loaders, synthetic scene generation, trajectory formats."""
