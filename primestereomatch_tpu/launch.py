"""`python -m primestereomatch_tpu.launch` — alias for parallel.launch.

Kept import-light: the real module defers all JAX imports until after
`jax.distributed.initialize`.
"""

from primestereomatch_tpu.parallel.launch import (  # noqa: F401
    initialize,
    main,
    spawn_local,
    worker_main,
)

if __name__ == "__main__":
    import sys

    sys.exit(main())
