"""RL agents (PPO)."""
