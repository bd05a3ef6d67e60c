package graft.ml

/** Driver-side Adam optimizer state (Kingma & Ba 2015, the Keras
  * defaults β₁=0.9, β₂=0.999, ε=1e-8 every reference estimator uses),
  * shared by the flat-gradient trainers so the update rule exists once.
  * `step(g, t)` returns the bias-corrected update to SUBTRACT from the
  * parameters; the caller owns the parameter layout. */
private[ml] final class AdamState(sz: Int, lr: Double) {
  private val m = new Array[Double](sz)
  private val v = new Array[Double](sz)
  private val (beta1, beta2, eps) = (0.9, 0.999, 1e-8)

  def step(g: Array[Double], t: Int): Array[Double] = {
    val out = new Array[Double](sz)
    val bc1 = 1.0 - math.pow(beta1, t)
    val bc2 = 1.0 - math.pow(beta2, t)
    var i = 0
    while (i < sz) {
      m(i) = beta1 * m(i) + (1 - beta1) * g(i)
      v(i) = beta2 * v(i) + (1 - beta2) * g(i) * g(i)
      out(i) = lr * (m(i) / bc1) / (math.sqrt(v(i) / bc2) + eps)
      i += 1
    }
    out
  }

  /** Convenience for flat-parameter trainers: apply the step in place. */
  def update(p: Array[Double], g: Array[Double], t: Int): Unit = {
    val s = step(g, t)
    var i = 0
    while (i < sz) { p(i) -= s(i); i += 1 }
  }
}
