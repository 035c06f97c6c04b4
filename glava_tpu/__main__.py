from glava_tpu.cli import main

raise SystemExit(main())
