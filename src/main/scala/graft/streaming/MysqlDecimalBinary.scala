package graft.streaming

/** MySQL binary DECIMAL (`T_NEWDECIMAL`, type 246) codec — the
  * row-image encoding of the reference's hardest-fought type (the
  * trailing-zeros battle of mysql_to_clickhouse_sync.py:71-83 is all
  * about DECIMAL rendering). Written from the PUBLIC format described
  * in `strings/decimal.c` (`decimal2bin`/`bin2decimal`) and the MySQL
  * Internals manual:
  *
  *   - digits pack in base-10^9: every 9 decimal digits take 4 bytes,
  *     big-endian; a partial group of 1..8 digits takes
  *     `dig2bytes(n)` = 1,1,2,2,3,3,4,4 bytes;
  *   - layout (precision P, scale S, intg = P-S): the LEADING partial
  *     intg group (intg % 9 digits), then intg/9 full groups, then
  *     S/9 full frac groups, then the TRAILING partial frac group
  *     (S % 9 digits);
  *   - negative values store the one's complement of every byte;
  *   - the first byte's MSB is XORed with 0x80 — so a stored positive
  *     value reads with its MSB SET, which is also how the sign is
  *     recovered.
  *
  * The decoded value is a [[java.math.BigDecimal]] carrying EXACTLY the
  * column's declared scale (trailing zeros preserved) — the scale the
  * reference fights to keep intact through its sync.
  */
object MysqlDecimalBinary {

  final class DecimalBinaryException(msg: String) extends RuntimeException(msg)

  private val DigPerGroup = 9
  /** bytes needed for 0..9 leftover decimal digits */
  private val dig2bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
  private val pow10 = Array.iterate(1L, 10)(_ * 10L)

  private def checkPS(precision: Int, scale: Int): Unit =
    if (precision < 1 || precision > 65 || scale < 0 || scale > 30 ||
        scale > precision)
      throw new DecimalBinaryException(
        s"invalid DECIMAL($precision,$scale): need 1<=P<=65, 0<=S<=30, S<=P")

  /** On-wire byte length of a DECIMAL(precision, scale) value — fixed
    * per column, which is why the row-image decode needs no length
    * prefix (the TABLE_MAP metadata carries P and S).
    */
  def binSize(precision: Int, scale: Int): Int = {
    checkPS(precision, scale)
    val intg = precision - scale
    (intg / DigPerGroup) * 4 + dig2bytes(intg % DigPerGroup) +
      (scale / DigPerGroup) * 4 + dig2bytes(scale % DigPerGroup)
  }

  /** Encode `v` as DECIMAL(precision, scale). `v` must fit: its scale
    * must not exceed `scale` (no silent rounding — a fixture that
    * loses digits would "round-trip" by accident) and its digit count
    * after scaling must fit `precision`.
    */
  def encode(v: java.math.BigDecimal, precision: Int, scale: Int): Array[Byte] = {
    checkPS(precision, scale)
    val scaled =
      try v.setScale(scale)
      catch { case _: ArithmeticException =>
        throw new DecimalBinaryException(
          s"value $v does not fit scale $scale without rounding")
      }
    val neg = scaled.signum < 0
    val digits = scaled.abs.movePointRight(scale).toBigIntegerExact.toString
    if (digits.length > precision)
      throw new DecimalBinaryException(
        s"value $v overflows DECIMAL($precision,$scale)")
    val all = ("0" * (precision - digits.length)) + digits
    val intg = precision - scale
    val out = new Array[Byte](binSize(precision, scale))
    var o = 0
    def put(group: String, nBytes: Int): Unit = {
      val g = if (group.isEmpty) 0L else group.toLong
      var i = nBytes - 1
      while (i >= 0) { out(o) = ((g >> (8 * i)) & 0xff).toByte; o += 1; i -= 1 }
    }
    val intg0x = intg % DigPerGroup
    put(all.substring(0, intg0x), dig2bytes(intg0x))
    var p = intg0x
    while (p < intg) { put(all.substring(p, p + DigPerGroup), 4); p += DigPerGroup }
    val frac0 = scale / DigPerGroup
    var q = intg
    var k = 0
    while (k < frac0) { put(all.substring(q, q + DigPerGroup), 4); q += DigPerGroup; k += 1 }
    val frac0x = scale % DigPerGroup
    put(all.substring(q, q + frac0x), dig2bytes(frac0x))
    if (neg) { var i = 0; while (i < out.length) { out(i) = (~out(i)).toByte; i += 1 } }
    out(0) = (out(0) ^ 0x80).toByte
    out
  }

  /** Decode exactly `binSize(precision, scale)` bytes. Refuses (never
    * guesses around) a group value outside its digit range — the
    * corruption signature of a misaligned row-image cursor.
    */
  def decode(bytes: Array[Byte], precision: Int, scale: Int): java.math.BigDecimal = {
    checkPS(precision, scale)
    val want = binSize(precision, scale)
    if (bytes.length != want)
      throw new DecimalBinaryException(
        s"DECIMAL($precision,$scale) needs $want bytes, got ${bytes.length}")
    val b = bytes.clone()
    val positive = (b(0) & 0x80) != 0
    b(0) = (b(0) ^ 0x80).toByte
    if (!positive) { var i = 0; while (i < b.length) { b(i) = (~b(i)).toByte; i += 1 } }
    var o = 0
    val sb = new StringBuilder(precision)
    def take(nDigits: Int, nBytes: Int): Unit = if (nDigits > 0) {
      var v = 0L; var i = 0
      while (i < nBytes) { v = (v << 8) | (b(o) & 0xff); o += 1; i += 1 }
      if (v >= pow10(nDigits))
        throw new DecimalBinaryException(
          s"digit group $v exceeds $nDigits digits — corrupt or misaligned")
      val s = v.toString
      sb.append("0" * (nDigits - s.length)).append(s)
    }
    val intg = precision - scale
    take(intg % DigPerGroup, dig2bytes(intg % DigPerGroup))
    var k = 0
    while (k < intg / DigPerGroup) { take(DigPerGroup, 4); k += 1 }
    k = 0
    while (k < scale / DigPerGroup) { take(DigPerGroup, 4); k += 1 }
    take(scale % DigPerGroup, dig2bytes(scale % DigPerGroup))
    val unscaled = new java.math.BigInteger(if (sb.isEmpty) "0" else sb.toString)
    val mag = new java.math.BigDecimal(unscaled, scale)
    if (positive) mag else mag.negate()
  }
}
