package graft.ml

/** Driver-side optimizer state shared by the flat-gradient trainers so
  * each update rule exists once. The default is Adam (Kingma & Ba 2015,
  * the Keras defaults β₁=0.9, β₂=0.999, ε=1e-8 every reference
  * estimator uses); `algo` selects the other Keras optimizer classes
  * the reference's `optimizer` field accepts (base.py:31,48 —
  * `Type[optimizers.Optimizer]`, default Adam):
  *
  *  - "sgd"     — plain gradient descent (Keras SGD default
  *                momentum = 0.0)
  *  - "rmsprop" — ρ=0.9, ε=1e-7 (the Keras RMSprop defaults):
  *                v = ρv + (1−ρ)g², step = lr·g/(√v + ε)
  *  - "adamax"  — β₁=0.9, β₂=0.999, ε=1e-7 (the Keras Adamax
  *                defaults, the same rule FeaturePenalizer uses):
  *                u = max(β₂u, |g|), step = lr/(1−β₁ᵗ)·m/(u + ε)
  *
  * `step(g, t)` returns the update to SUBTRACT from the parameters;
  * the caller owns the parameter layout. */
private[ml] final class AdamState(sz: Int, lr: Double,
    algo: String = "adam") {
  require(Set("adam", "sgd", "rmsprop", "adamax")(algo),
    s"optimizer must be adam|sgd|rmsprop|adamax, got $algo")
  private val m = if (algo == "sgd" || algo == "rmsprop") null
    else new Array[Double](sz)
  private val v = if (algo == "sgd") null else new Array[Double](sz)
  private val (beta1, beta2) = (0.9, 0.999)
  private val eps = if (algo == "adam") 1e-8 else 1e-7

  def step(g: Array[Double], t: Int): Array[Double] = {
    val out = new Array[Double](sz)
    var i = 0
    algo match {
      case "adam" =>
        val bc1 = 1.0 - math.pow(beta1, t)
        val bc2 = 1.0 - math.pow(beta2, t)
        while (i < sz) {
          m(i) = beta1 * m(i) + (1 - beta1) * g(i)
          v(i) = beta2 * v(i) + (1 - beta2) * g(i) * g(i)
          out(i) = lr * (m(i) / bc1) / (math.sqrt(v(i) / bc2) + eps)
          i += 1
        }
      case "sgd" =>
        while (i < sz) { out(i) = lr * g(i); i += 1 }
      case "rmsprop" =>
        while (i < sz) {
          v(i) = 0.9 * v(i) + 0.1 * g(i) * g(i)
          out(i) = lr * g(i) / (math.sqrt(v(i)) + eps)
          i += 1
        }
      case "adamax" =>
        val bc1 = 1.0 - math.pow(beta1, t)
        while (i < sz) {
          m(i) = beta1 * m(i) + (1 - beta1) * g(i)
          v(i) = math.max(beta2 * v(i), math.abs(g(i)))
          out(i) = lr / bc1 * m(i) / (v(i) + eps)
          i += 1
        }
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
