from nbldpc_tpu.cli import main

raise SystemExit(main())
