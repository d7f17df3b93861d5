package graft.cel

/** DecoratedError-style source-located error rendering (reference
  * lib/errors.go:28-52 + mito.go:335): the offset carried by a VErr is
  * resolved against the program text and rendered in cel-go's
  * common.Errors.ToDisplayString format —
  *
  *   ERROR: <input>:1:3: division by zero
  *    | 1/0
  *    | ..^
  */
object Errors {

  /** 1-based (line, column) of a byte offset in `src`. */
  def lineCol(src: String, offset: Int): (Int, Int) = {
    var line = 1
    var lineStart = 0
    var i = 0
    val off = math.max(0, math.min(offset, src.length))
    while (i < off) {
      if (src.charAt(i) == '\n') { line += 1; lineStart = i + 1 }
      i += 1
    }
    (line, off - lineStart + 1)
  }

  /** Render an error with its source snippet and caret. */
  def display(src: String, offset: Int, msg: String,
      srcName: String = "<input>"): String = {
    if (offset < 0) return s"ERROR: $srcName:-1:-1: $msg"
    val (line, col) = lineCol(src, offset)
    val lineText = src.linesIterator.drop(line - 1).nextOption().getOrElse("")
    s"ERROR: $srcName:$line:$col: $msg\n" +
      s" | $lineText\n" +
      s" | ${"." * (col - 1)}^"
  }
}
