from fastpasta_spark.cli import main

raise SystemExit(main())
