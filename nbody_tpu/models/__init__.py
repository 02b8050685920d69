from .direct_sum import run_problems_12, run_problem_3, P12Result

__all__ = ["run_problems_12", "run_problem_3", "P12Result"]
