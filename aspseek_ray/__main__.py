from aspseek_ray.cli import main

raise SystemExit(main())
