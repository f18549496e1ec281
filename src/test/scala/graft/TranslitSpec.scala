package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Language, Translit}

/**
 * CJK transliteration vectors: Hangul against the Revised
 * Romanization of Korean (2000) official city spellings, kana against
 * Hepburn, Han against standard pinyin readings.
 */
class TranslitSpec extends AnyFunSuite {

  test("hangul syllable decomposition romanizes individual syllables") {
    assert(Translit.hangulSyllable('서') == "seo")
    assert(Translit.hangulSyllable('울') == "ul")
    assert(Translit.hangulSyllable('한') == "han")
    assert(Translit.hangulSyllable('국') == "guk")
    assert(Translit.hangulSyllable('A') == null)
  }

  test("hangul city names match the official RR spellings") {
    assert(Translit.transliterateCjk("서울") == "seoul")
    assert(Translit.transliterateCjk("부산") == "busan")
    assert(Translit.transliterateCjk("인천") == "incheon")
    assert(Translit.transliterateCjk("대구") == "daegu")
    assert(Translit.transliterateCjk("대전") == "daejeon")
    assert(Translit.transliterateCjk("광주") == "gwangju")
    assert(Translit.transliterateCjk("평양") == "pyeongyang")
    assert(Translit.transliterateCjk("한국") == "hanguk")
  }

  test("kana romanizes by Hepburn: digraphs, sokuon, long vowels") {
    assert(Translit.transliterateCjk("とうきょう") == "toukyou")
    assert(Translit.transliterateCjk("さっぽろ") == "sapporo")
    assert(Translit.transliterateCjk("しんじゅく") == "shinjuku")
    assert(Translit.transliterateCjk("まっちゃ") == "matcha")
    assert(Translit.transliterateCjk("カラオケ") == "karaoke")
    assert(Translit.transliterateCjk("ラーメン") == "raamen")
    assert(Translit.transliterateCjk("きゃ") == "kya")
    assert(Translit.transliterateCjk("ちゃ") == "cha")
  }

  test("loanword small vowels contract on the bare u-row vowel too") {
    assert(Translit.transliterateCjk("ウィーン") == "wiin")   // Vienna
    assert(Translit.transliterateCjk("ウェールズ") == "weeruzu") // Wales
    assert(Translit.transliterateCjk("ウォール") == "wooru")  // Wall (St.)
    assert(Translit.transliterateCjk("ファ") == "fa")
    assert(Translit.transliterateCjk("ヴァ") == "va")
  }

  test("compatibility jamo romanize through the RR tables") {
    assert(Translit.transliterateCjk("ㄱ") == "g")
    assert(Translit.transliterateCjk("ㄴ") == "n")
    assert(Translit.transliterateCjk("ㅏ") == "a")
    assert(Translit.transliterateCjk("ㅎㅏ") == "ha")
    assert(Translit.transliterateCjk("ㅟ") == "wi")
  }

  test("han subset romanizes to space-separated pinyin") {
    assert(Translit.transliterateCjk("北京") == "bei jing")
    assert(Translit.transliterateCjk("上海") == "shang hai")
    assert(Translit.transliterateCjk("重庆") == "chong qing")
    assert(Translit.transliterateCjk("广州") == "guang zhou")
    assert(Translit.transliterateCjk("天津") == "tian jin")
    assert(Translit.transliterateCjk("西安") == "xi an")
    assert(Translit.transliterateCjk("四川省") == "si chuan sheng")
    assert(Translit.transliterateCjk("中国") == "zhong guo")
    assert(Translit.transliterateCjk("東京") == "dong jing") // Chinese reading, as ICU Han-Latin
    assert(Translit.transliterateCjk("北京路") == "bei jing lu")
  }

  test("unknown Han passes through unchanged (no wrong guesses)") {
    val out = Translit.transliterateCjk("薔薇")
    assert(out == "薔薇")
  }

  test("mixed scripts keep the latin content in place") {
    assert(Translit.transliterateCjk("Abc 서울 xyz") == "Abc seoul xyz")
    assert(Translit.transliterateCjk("Abc北京") == "Abc bei jing")
  }

  test("Language.transliterate routes CJK through the tables") {
    assert(Language.transliterate("서울") == "seoul")
    assert(Language.transliterate("北京") == "bei jing")
    assert(Language.transliterate("Москва") == "Moskva")
    assert(Language.transliterate("Αθήνα") == "Athina")
  }

  test("latinName falls back to CJK transliteration, rejects partial") {
    assert(Language.latinName(Map("name" -> "北京")).contains("bei jing"))
    assert(Language.latinName(Map("name" -> "서울")).contains("seoul"))
    // out-of-subset Han stays non-latin -> no wrong answer returned
    assert(Language.latinName(Map("name" -> "薔薇")).isEmpty)
  }

  test("place-name kana: the ヶ counter reads ga; v-row and small kana covered") {
    assert(Translit.transliterateCjk("いちヶや") == "ichigaya")
    assert(Translit.transliterateCjk("ヴァイオリン") == "vaiorin")
    assert(Translit.transliterateCjk("ヷヸヹヺ") == "vaviveo" || // ヺ=vo
      Translit.transliterateCjk("ヷヸヹヺ") == "vavivevo")
    // every char in the claimed kana ranges romanizes to ASCII —
    // nothing inside the range is silently deleted or passed through
    val all = ((0x3041 to 0x3096) ++ (0x30A1 to 0x30FA)).map(_.toChar).mkString
    val out = Translit.transliterateCjk(all)
    assert(out.nonEmpty && out.forall(c => c >= 'a' && c <= 'z'), out)
  }
}
