from raven_tpu.cli import main

raise SystemExit(main())
