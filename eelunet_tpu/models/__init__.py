"""Model zoo: unet, eelunet, unet++, egeunet, malunet, unext, unext_s."""
