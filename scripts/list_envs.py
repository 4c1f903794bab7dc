"""Print the task registry (replaces reference scripts/list_envs.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cat_tpu.tasks import registry  # noqa: E402


def main():
    tasks = registry.list_tasks()
    width = max(len(n) for n in tasks) + 2
    print(f"{'Task':<{width}}Description")
    print("-" * (width + 50))
    for name, spec in sorted(tasks.items()):
        print(f"{name:<{width}}{spec.description}")


if __name__ == "__main__":
    main()
