from primestereomatch_tpu.cli import main

raise SystemExit(main())
