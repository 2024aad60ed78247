"""Framework bindings (reference L3: pytorch_binding/, tensorflow_binding/).

Submodules import their host framework lazily so that environments without
torch or tensorflow can still use the JAX core:

  torch_binding — packed-layout torch.autograd surface over the native engine
  tf_binding    — packed-layout TF surface + padded jax2tf path
  returnn_op    — RETURNN re-export of the TF surface
"""
